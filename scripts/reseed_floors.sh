#!/bin/bash
# Reseed the bench floor histories (bench_prev_<sf>.json) by the SAME
# rule the per-round runs apply, so floor provenance is reproducible
# instead of hand-assembled across commits (round 14 needed four
# separate floor-history commits).
#
# Runs N full graft.Bench passes at the given SF dir. Each full pass
# rewrites the floor file through Bench.mergeFloors: clean samples
# append to the history (median = the phantom/suspect floor) and
# min-merge the trajectory "t"; SUSPECT samples min-merge but never
# enter the history; FAILED queries keep their prior entries. An idle
# box therefore regenerates floors matching the committed ones within
# noise.
#
# Usage: scripts/reseed_floors.sh [SF_DIR] [N_PASSES] [fresh|merge]
#   SF_DIR   default /root/testdata/sf0.1 (the driver-round scale)
#   N_PASSES default 4 (HistLen-bounded; more passes just roll the
#            window)
#   fresh    start from an EMPTY floor file (full re-seed) instead of
#            merging into the committed one
set -euo pipefail
SF=${1:-/root/testdata/sf0.1}
N=${2:-4}
MODE=${3:-merge}
cd "$(dirname "$0")/.."
# SPARK_GRAFT_BENCH_PREV redirects the floor file (graft.Bench honors
# it) — lets a validation run regenerate floors into a scratch path
# and diff against the committed file without touching it.
# GRAFT_CLASSES points at a snapshot of target/scala-2.13/classes so a
# long reseed run is immune to concurrent recompiles.
PREV="${SPARK_GRAFT_BENCH_PREV:-bench_prev_$(basename "$SF").json}"
CLASSES="${GRAFT_CLASSES:-target/scala-2.13/classes}"
if [ "$MODE" = fresh ]; then
  rm -f "$PREV"
  echo "[reseed] fresh mode: starting from an empty $PREV" >&2
fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for i in $(seq 1 "$N"); do
  echo "[reseed] pass $i/$N ($SF)" >&2
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    SPARK_GRAFT_BENCH_PREV="$PREV" \
    java $ADD_OPENS -Xmx"${SPARK_GRAFT_BENCH_MEM:-48g}" \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CLASSES:/opt/spark/jars/*" graft.Bench >/dev/null
done
echo "[reseed] wrote $PREV ($N passes merged)" >&2
