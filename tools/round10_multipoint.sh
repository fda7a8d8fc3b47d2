#!/bin/bash
# Round-10 multi-point executed-scale refresh: five bench points on the
# SAME final binary, at the SHIPPED defaults — which since round 10 are
# size-gated (initialPartitionNum = cores below 1 GiB input, 8x cores
# above; every artifact records init_parts in its knobs field, so the
# sf3->sf10 step is self-describingly a knob transition — the PartsProbe
# A/B in SCALE.md round-9/10 sections covers why that transition is
# quiet-host neutral). Correctness gates are NOT re-run here: round 10's
# query-semantic changes (q113/q114, q113 checkpoint, q114 hyperplane
# literals) are oracle-gated at every scale by tools/round10_gate.sh.
set -eo pipefail
cd /root/repo
CP=${GRAFT_MP_CP:-/tmp/gate_classes_r10mp}
rm -rf "$CP" && mkdir -p "$CP" && cp -a target/scala-2.13/classes/. "$CP/"
export GRAFT_CP="$CP"
export GRAFT_GATE_EMB_MOD=4

bench30 () { # sfdir outfile
  rm -f bench_last.json
  GRAFT_GATE_RANGE_WINDOW_US=30000000 SPARK_GRAFT_SF_DIR="$1" \
    tools/run.sh graft.Bench 2>/dev/null | tail -1 || true
  if [ ! -s bench_last.json ]; then
    echo "FATAL: $1 bench did not produce bench_last.json" >&2
    exit 1
  fi
  cp bench_last.json "$2"
}

echo "== bench sf0.1 =="; bench30 /root/testdata/sf0.1  bench_sf0.1_r10.json
echo "== bench sf0.3 =="; bench30 /root/repo/data/sf0.3 bench_sf0.3.json
echo "== bench sf1 ==";   bench30 /root/repo/data/sf1   bench_sf1.json
echo "== bench sf3 ==";   bench30 /root/repo/data/sf3   bench_sf3.json
echo "== bench sf10 ==";  bench30 /root/repo/data/sf10  bench_sf10.json

git checkout -- bench_last.json 2>/dev/null || rm -f bench_last.json

python3 tools/scaling_fit.py sf0.1=bench_sf0.1_r10.json \
  sf0.3=bench_sf0.3.json sf1=bench_sf1.json sf3=bench_sf3.json \
  sf10=bench_sf10.json | tee scaling_fit_r10.md
echo MULTIPOINT_DONE
