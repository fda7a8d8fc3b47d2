#!/bin/bash
# Round-9 final-binary evidence sweep. The earlier round-9 sf10 gate
# (correctness_sf10.txt, 2026-08-15T21:35Z) predates two diffs: the AQE
# over-partitioning knob (execution-level; correctness must be
# partition-count-invariant) and new q112. This script renews, on ONE
# snapshotted binary:
#   1. oracle gates at sf0.3, sf1 (VERDICT r8 #7), sf3 — 112 queries
#      each, proving partition-count invariance at three scales
#   2. knob-identical benches sf0.1/0.3/1/3/10 (30s window, emb_mod=4),
#      serialized on a quiet host (benches under load are garbage —
#      the round-9 PartsProbe lesson)
#   3. five-point scaling fit -> scaling_fit_r9.md
#   4. the sf10 gate, changed-queries-first (q112 + the knob-heaviest
#      rows land even if the session is cut), then the full sweep +
#      replays + script-emitted tally
set -eo pipefail
cd /root/repo
CP=${GRAFT_R9B_CP:-/tmp/gate_classes_r9b}
rm -rf "$CP" && mkdir -p "$CP" && cp -a target/scala-2.13/classes/. "$CP/"
export GRAFT_CP="$CP"
export GRAFT_GATE_EMB_MOD=4

gate () { # sfdir-name artifact-file
  rm -rf "/tmp/verify_$1"
  GRAFT_GATE_RANGE_WINDOW_US=3000000 SPARK_GRAFT_CPUS=32 \
    tools/run.sh graft.Verify "/root/repo/data/$1" "/tmp/verify_$1" \
    > "/tmp/verify_$1.log" 2>&1
  # `|| true`: compare exits non-zero when ANY row is bad; under
  # set -eo pipefail that would abort the script before the benches
  # (the round-8 failure shape). The artifact records the bad rows.
  { echo "# gate $1 range_window_us=3000000 emb_mod=4 $(date -u +%FT%TZ)";
    GRAFT_COMPARE_SUBPROC=1 GRAFT_COMPARE_TIMEOUT_S=1800 \
      python3 tools/compare.py "/root/repo/data/$1" "/tmp/verify_$1" \
      || true; } | tee "$2"
}
bench30 () { # sfdir outfile
  rm -f bench_last.json
  # `|| true`: under set -eo pipefail a launcher failure would abort the
  # function before the bench_last.json check below — the check is the
  # failure path that reports (ADVICE r9).
  GRAFT_GATE_RANGE_WINDOW_US=30000000 SPARK_GRAFT_SF_DIR="$1" \
    tools/run.sh graft.Bench 2>/dev/null | tail -1 || true
  if [ ! -s bench_last.json ]; then
    echo "FATAL: $1 bench did not produce bench_last.json" >&2
    exit 1
  fi
  cp bench_last.json "$2"
}

echo "== gate sf0.3 =="; gate sf0.3 correctness_sf0.3_w3.txt
echo "== gate sf1 ==";   gate sf1   correctness_sf1.txt
echo "== gate sf3 ==";   gate sf3   correctness_sf3_w3.txt

echo "== bench sf0.1 =="; bench30 /root/testdata/sf0.1  bench_sf0.1_knobbed.json
echo "== bench sf0.3 =="; bench30 /root/repo/data/sf0.3 bench_sf0.3.json
echo "== bench sf1 ==";   bench30 /root/repo/data/sf1   bench_sf1.json
echo "== bench sf3 ==";   bench30 /root/repo/data/sf3   bench_sf3.json
echo "== bench sf10 ==";  bench30 /root/repo/data/sf10  bench_sf10.json
rm -f bench_last.json

python3 tools/scaling_fit.py sf0.1=bench_sf0.1_knobbed.json \
  sf0.3=bench_sf0.3.json sf1=bench_sf1.json sf3=bench_sf3.json \
  sf10=bench_sf10.json | tee scaling_fit_r9.md
echo MULTIPOINT_DONE

echo "== sf10 gate (final binary) =="
GRAFT_SF10_CP="$CP" bash tools/round9_sf10_gate.sh
echo ROUND9B_DONE
