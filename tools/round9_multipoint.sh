#!/bin/bash
# Round-9 multi-point executed-scale refresh.
#
# Round 9 changed q56 (df derived from the tf aggregate so both join
# branches share ONE scan+explode+exchange via ReuseExchange) and added
# q111 (content_free curation consumer); Bench's stdout contract is now
# totals-only. This renews every scale point on the SAME binary:
#   - fast oracle gates (3s range window) at sf0.3 and sf3 — these also
#     exercise compare.py's new up-front threads=1 routing for q09's
#     known-heavy oracle (no ERR-then-retry cycle anymore)
#   - knob-identical benches (30s window, emb_mod=4) at
#     sf0.1/0.3/1/3/10, all five points from one binary
#   - five-point scaling fit -> scaling_fit_r9.md
set -eo pipefail
cd /root/repo
CP=${GRAFT_MP_CP:-/tmp/gate_classes_r9mp}
rm -rf "$CP" && mkdir -p "$CP" && cp -a target/scala-2.13/classes/. "$CP/"
export GRAFT_CP="$CP"
export GRAFT_GATE_EMB_MOD=4

verify3 () { # label
  rm -rf "/tmp/verify_$1"
  GRAFT_GATE_RANGE_WINDOW_US=3000000 SPARK_GRAFT_CPUS=32 \
    tools/run.sh graft.Verify "/root/repo/data/$1" "/tmp/verify_$1" \
    > "/tmp/verify_$1.log" 2>&1
  # `|| true`: compare exits non-zero when ANY row is bad, and under
  # set -eo pipefail that would abort the whole script BEFORE the
  # benches (the exact round-8 failure shape).
  { echo "# gate $1 range_window_us=3000000 emb_mod=4 $(date -u +%FT%TZ)";
    GRAFT_COMPARE_SUBPROC=1 GRAFT_COMPARE_TIMEOUT_S=1800 \
      python3 tools/compare.py "/root/repo/data/$1" "/tmp/verify_$1" \
      || true; } \
    | tee "correctness_${1}_w3.txt"
  # Safety net only: compare.py now routes q09 to a threads=1 child up
  # front at sf>=3, so this re-run should never trigger. If it does,
  # the appended lines are tool-emitted (ADVICE r8: no hand edits).
  if grep -q "^ERR  q09" "correctness_${1}_w3.txt"; then
    { echo "# re-run of the ERR q09 row (fresh child, threads=1):";
      GRAFT_COMPARE_THREADS=1 GRAFT_COMPARE_SUBPROC=1 \
        GRAFT_COMPARE_TIMEOUT_S=1800 \
        GRAFT_COMPARE_ONLY=q09_behavioral_clustering \
        python3 tools/compare.py "/root/repo/data/$1" "/tmp/verify_$1" \
        || true; } | tee -a "correctness_${1}_w3.txt"
  fi
}
bench30 () { # sfdir outfile
  rm -f bench_last.json
  GRAFT_GATE_RANGE_WINDOW_US=30000000 SPARK_GRAFT_SF_DIR="$1" \
    tools/run.sh graft.Bench 2>/dev/null | tail -1
  if [ ! -s bench_last.json ]; then
    echo "FATAL: $1 bench did not produce bench_last.json" >&2
    exit 1
  fi
  cp bench_last.json "$2"
}

echo "== verify sf0.3 (3s window) =="; verify3 sf0.3
echo "== verify sf3 (3s window) ==";   verify3 sf3

echo "== bench sf0.1 =="; bench30 /root/testdata/sf0.1  bench_sf0.1_knobbed.json
echo "== bench sf0.3 =="; bench30 /root/repo/data/sf0.3 bench_sf0.3.json
echo "== bench sf1 ==";   bench30 /root/repo/data/sf1   bench_sf1.json
echo "== bench sf3 ==";   bench30 /root/repo/data/sf3   bench_sf3.json
echo "== bench sf10 ==";  bench30 /root/repo/data/sf10  bench_sf10.json

# bench_last.json is scratch (Bench rewrites it every run): restore the
# committed snapshot if tracked, else drop — a bare `git checkout` on an
# untracked path aborts under set -eo pipefail (ADVICE r8).
git checkout -- bench_last.json 2>/dev/null || rm -f bench_last.json

python3 tools/scaling_fit.py sf0.1=bench_sf0.1_knobbed.json \
  sf0.3=bench_sf0.3.json sf1=bench_sf1.json sf3=bench_sf3.json \
  sf10=bench_sf10.json | tee scaling_fit_r9.md
echo MULTIPOINT_DONE
