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
  # highest-N archive NOT produced at the current git HEAD — once the
  # driver archives this round's artifact, a re-run (including the
  # SPARK_GRAFT_BENCH_ONLY flagged-mover re-check) must still compare
  # against the PREVIOUS round, not self-compare vacuously
  PREV=$(python3 - <<'PY'
import json, re, subprocess, glob
head = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                      text=True).stdout.strip()
cands = [f for f in glob.glob("BENCH_r*.json")
         if re.fullmatch(r"BENCH_r\d+\.json", f)]  # filter BEFORE the int key
for f in sorted(cands, key=lambda p: int(re.search(r"\d+", p).group()),
                reverse=True):
    try:
        d = json.load(open(f))
        if "parsed" in d:
            d = d["parsed"]  # driver wrapper; may be null on tail truncation
    except Exception:
        continue
    if not isinstance(d, dict) or not isinstance(d.get("queries"), dict):
        continue  # unusable archive (e.g. driver tail-truncated, parsed=null)
    if d.get("head") == head:
        continue  # same binary: self-compare would pass vacuously
    print(f)
    break
PY
)
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
bad = d["failed"]  # the artifact records failed QUERY NAMES (a list)
if not isinstance(bad, list):
    bad = [q for q, v in d.get("queries", {}).items() if v < 0]
if bad:
    # a crashed query records -1, drops out of the queries map, and
    # would silently vanish from BenchDelta's common set — failures
    # fail the gate outright, they don't get adjudicated as drift
    print(f"bench_gate: FAIL — {len(bad)} quer"
          f"{'y' if len(bad) == 1 else 'ies'} failed outright: "
          f"{', '.join(bad)}", file=sys.stderr)
    sys.exit(3)
PY

# the gate: median-normalized, spread-aware (exit 1 = plan regression).
# sbt prefixes program stdout with "[info] " — STRIP the prefix rather
# than dropping the lines (dropping hid both the delta table and
# BenchDelta's own error messages).
set +e
sbt -batch "runMain graft.tools.BenchDelta $PREV $OUT" 2>/dev/null \
  | sed -E 's/^\[(info|error)\] //' \
  | grep -vE '^(\[success\]|loading |set current project|running \(|welcome to sbt|Using Spark|Total time)'
rc=${PIPESTATUS[0]}
set -e
if [ "$rc" -ne 0 ]; then
  echo "bench_gate: FAIL (beyond-noise plan regression vs $PREV; rc=$rc)" >&2
  exit "$rc"
fi
echo "bench_gate: PASS (no beyond-noise plan regressions vs $PREV)"
