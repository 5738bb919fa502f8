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
  # Pick the newest usable baseline, PREFERRING the gate's own archives
  # (BENCH_r{N}_gate.json — written by this script, always parseable)
  # over driver archives (BENCH_r{N}.json — may be tail-truncated with
  # parsed=null). Round-10 post-mortem: the driver's r9 archive was
  # truncated, the picker fell back TWO rounds to r8, and the ambient
  # median correction absorbed two rounds of real speedups into 9
  # phantom "regressions" at a clean HEAD — a gate that cries wolf
  # out-of-the-box gets ignored. Same-N gate beats driver; archives at
  # the current HEAD are skipped (self-compare would pass vacuously).
  PREV=$(python3 - <<'PY'
import json, re, subprocess, glob
head = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                      text=True).stdout.strip()
cands = []
for f in glob.glob("BENCH_r*.json"):
    m = re.fullmatch(r"BENCH_r(\d+)(_gate)?\.json", f)
    if m:
        cands.append((int(m.group(1)), 1 if m.group(2) else 0, f))
for _, _, f in sorted(cands, reverse=True):
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
# Persist this run as the round's canonical gate baseline (full-surface
# runs only — SPARK_GRAFT_BENCH_ONLY subsets would poison the common
# set): BENCH_r{N}_gate.json with N = current round (highest driver
# CORRECTNESS round + 1). Written on pass AND fail — the next round
# compares against this HEAD's actual numbers either way; commit it.
if [ -z "${SPARK_GRAFT_BENCH_ONLY:-}" ]; then
  python3 - "$OUT" <<'PY'
import glob, json, re, shutil, sys
rounds = [int(re.search(r"\d+", f).group())
          for f in glob.glob("CORRECTNESS_r*.json")
          if re.fullmatch(r"CORRECTNESS_r\d+\.json", f)]
n = (max(rounds) + 1) if rounds else 1
dst = f"BENCH_r{n:02d}_gate.json"
shutil.copyfile(sys.argv[1], dst)
print(f"bench_gate: baseline archived -> {dst} (commit it)", file=sys.stderr)
PY
fi
if [ "$rc" -ne 0 ]; then
  echo "bench_gate: FAIL (beyond-noise plan regression vs $PREV; rc=$rc)" >&2
  exit "$rc"
fi
echo "bench_gate: PASS (no beyond-noise plan regressions vs $PREV)"
