#!/usr/bin/env bash
# End-of-round bench gate, one command:
#
#   scripts/bench_gate.sh [prev.json] [out.json]
#
# Runs the headline bench (median-of-N, interleaved dual series) on a
# QUIET host — do not overlap with sbt test / Verify — then applies the
# spread-aware BenchDelta criterion against the previous round's
# archive: exit 0 iff no query regresses >25% AFTER dividing out the
# median per-query ratio (ambient host drift) AND beyond its own
# within-run sample spread (the noise floor). The new artifact also
# embeds prev/prev_norm_total_ratio itself (same normalization), with
# same-HEAD archives skipped so a re-run never self-compares.
#
# prev.json defaults to the highest-N BENCH_r{N}.json in the repo root.
# Environment: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
# SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_RUNS,
# SPARK_GRAFT_BENCH_ONLY (for quiet-window re-checks of flagged movers).
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
CPUS="${SPARK_GRAFT_CPUS:-32}"
PREV="${1:-}"
OUT="${2:-/tmp/bench_gate_new.json}"

if [ -z "$PREV" ]; then
  PREV=$(ls BENCH_r*.json 2>/dev/null | grep -E '^BENCH_r[0-9]+\.json$' | sort -V | tail -1 || true)
fi
if [ -z "$PREV" ]; then
  echo "bench_gate: no previous BENCH_r{N}.json found and none given" >&2
  exit 2
fi

echo "bench_gate: benching (sf=$SF_DIR cpus=$CPUS) ..." >&2
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '^{"metric"' | tail -1 > "$OUT"
echo "bench_gate: artifact -> $OUT" >&2
python3 - "$OUT" <<'PY'
import json, sys
d = json.load(open(sys.argv[1]))
print(f"bench_gate: total={d['value']}s failed={d['failed']} "
      f"prev={d.get('prev')} norm_ratio={d.get('prev_norm_total_ratio')}")
PY

# the gate: median-normalized, spread-aware (exit 1 = plan regression)
set +e
sbt -batch "runMain graft.tools.BenchDelta $PREV $OUT" 2>/dev/null \
  | grep -vE '^\[(info|success|error)\]'
rc=${PIPESTATUS[0]}
set -e
if [ "$rc" -ne 0 ]; then
  echo "bench_gate: FAIL (beyond-noise plan regression vs $PREV; rc=$rc)" >&2
  exit "$rc"
fi
echo "bench_gate: PASS (no beyond-noise plan regressions vs $PREV)"
