#!/bin/bash
# Mechanical per-round regression guard (VERDICT r3 ask #4).
#
# One command that refreshes every number the judge reads each round:
#   1. the headline pendulum bench (bench.py)
#   2. the CelebA family bench  -> docs/results/bench_celeba_r<N>.json
#   3. a COLD multichip dryrun (8 virtual CPU devices) with timing
#   4. the fast test tier
#   5. the SLOW test tier (-m slow: heavyweight packing equivalence,
#      celeba/CLI e2e — ~22 min; round-4 verdict: a guard that never
#      runs a third of the suite can miss regressions where the
#      expensive paths live)
# and writes a single round summary -> docs/results/round_check_r<N>.json.
#
# Usage: scripts/round_check.sh <round-number>   (e.g. 04)
# Run it at round close-out and commit the artifacts it writes.
# Note: steps 1-2 hold the (single-client) TPU chip; don't run anything
# else on the chip concurrently. Step 3 measures a true cold compile by
# pointing the XLA cache at a fresh temp dir.
set -u
cd "$(dirname "$0")/.."
RN="${1:?usage: scripts/round_check.sh <round-number, e.g. 04>}"
OUT="docs/results/round_check_r${RN}.json"
TMP="$(mktemp -d)"
trap 'rm -rf "$TMP"' EXIT

echo "== [1/5] pendulum headline bench =="
timeout 1800 python bench.py | tee "$TMP/pendulum.json"
PEND_RC=${PIPESTATUS[0]}

echo "== [2/5] celeba family bench =="
timeout 2400 python bench.py --metric celeba | tee "$TMP/celeba.json"
CELEBA_RC=${PIPESTATUS[0]}
if [ $CELEBA_RC -eq 0 ]; then
    tail -1 "$TMP/celeba.json" > "docs/results/bench_celeba_r${RN}.json"
fi

echo "== [3/5] cold multichip dryrun (fresh cache dir) =="
T0=$(date +%s)
timeout 1800 env CDGVAE_CACHE_DIR="$TMP/cold_cache" \
    python -c "import __graft_entry__ as g; g.dryrun_multichip(8)" \
    > "$TMP/dryrun.log" 2>&1
DRYRUN_RC=$?
DRYRUN_S=$(( $(date +%s) - T0 ))
echo "dryrun rc=$DRYRUN_RC wall=${DRYRUN_S}s"
tail -3 "$TMP/dryrun.log"

echo "== [4/5] fast test tier =="
T0=$(date +%s)
timeout 3600 sh scripts/test.sh > "$TMP/tests.log" 2>&1
TESTS_RC=$?
TESTS_S=$(( $(date +%s) - T0 ))
TESTS_TAIL=$(tail -1 "$TMP/tests.log")
echo "tests rc=$TESTS_RC wall=${TESTS_S}s: $TESTS_TAIL"

echo "== [5/5] slow test tier (-m slow) =="
T0=$(date +%s)
timeout 7200 env JAX_PLATFORMS=cpu \
    python -m pytest tests/ -q -m slow > "$TMP/tests_slow.log" 2>&1
SLOW_RC=$?
SLOW_S=$(( $(date +%s) - T0 ))
SLOW_TAIL=$(tail -1 "$TMP/tests_slow.log")
echo "slow tests rc=$SLOW_RC wall=${SLOW_S}s: $SLOW_TAIL"

export DRYRUN_RC DRYRUN_S TESTS_RC TESTS_S TESTS_TAIL PEND_RC CELEBA_RC \
       SLOW_RC SLOW_S SLOW_TAIL
python - "$RN" "$OUT" "$TMP" <<'EOF'
import json, sys, os, datetime
rn, out, tmp = sys.argv[1], sys.argv[2], sys.argv[3]

def last_json(path):
    try:
        lines = [l for l in open(path) if l.strip().startswith("{")]
        return json.loads(lines[-1]) if lines else None
    except Exception:
        return None

summary = {
    "round": rn,
    "date": datetime.date.today().isoformat(),
    "pendulum_rc": int(os.environ.get("PEND_RC", -1)),
    "celeba_rc": int(os.environ.get("CELEBA_RC", -1)),
    "pendulum_bench": last_json(os.path.join(tmp, "pendulum.json")),
    "celeba_bench": last_json(os.path.join(tmp, "celeba.json")),
    "dryrun_rc": int(os.environ.get("DRYRUN_RC", -1)),
    "dryrun_cold_s": int(os.environ.get("DRYRUN_S", -1)),
    "tests_rc": int(os.environ.get("TESTS_RC", -1)),
    "tests_s": int(os.environ.get("TESTS_S", -1)),
    "tests_tail": os.environ.get("TESTS_TAIL", ""),
    "slow_tests_rc": int(os.environ.get("SLOW_RC", -1)),
    "slow_tests_s": int(os.environ.get("SLOW_S", -1)),
    "slow_tests_tail": os.environ.get("SLOW_TAIL", ""),
}
with open(out, "w") as f:
    json.dump(summary, f, indent=1)
print(json.dumps(summary, indent=1))
print(f"-> {out}")
EOF
