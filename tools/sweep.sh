#!/usr/bin/env bash
# Per-scale-point JVM recycling for ScaleStress (round 17, r16 verdict
# item 5): one round-16 sweep arm OOM'd five sub-second rows after ~16k
# accumulated stages in a single JVM and had to be discarded — harness
# capacity, not engine capacity. Each scale point now runs in its own
# forked JVM as an (x1, xN) pair, so accumulated session state can never
# contaminate a published band; the per-JVM ratio lines are quiet-box
# pairs by construction. scale_table.py merges the repeated x1 rows by
# per-query min (the Bench min-of-N protocol).
#
# Usage: tools/sweep.sh <baseSfDir> <outRoot> <mults-csv> <logfile>
#   e.g. tools/sweep.sh /root/testdata/sf0.1 /tmp/graft_scale 10,30,100 /tmp/scale_a.log
# Honors SPARK_DRIVER_MEM (default 24g), SPARK_GRAFT_CPUS (default 32),
# and passes SPARK_GRAFT_SCALE_ONLY through for subset sweeps.
set -euo pipefail
BASE=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/graft_scale}
MULTS=${3:-10,30,100}
LOG=${4:?usage: tools/sweep.sh <baseSfDir> <outRoot> <mults-csv> <logfile>}
: > "$LOG"
IFS=',' read -ra MS <<< "$MULTS"
for m in "${MS[@]}"; do
  echo "[sweep] scale x$m in a fresh JVM" >&2
  # run_tool.sh launches the compiled classes directly: no sbt startup per
  # point, and no contention with an interactive sbt server on the build
  SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-24g} SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    "$(dirname "$0")/run_tool.sh" graft.tools.ScaleStress "$BASE" "$OUT" "$m" 2>&1 | tee -a "$LOG"
done
echo "[sweep] done — table: python3 tools/scale_table.py $LOG" >&2
