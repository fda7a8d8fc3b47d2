#!/bin/bash
# Round-6 phase 3: complete the multi-point executed-scale evidence.
#
# Window policy (PLANS.md "sf3 DuckDB-oracle cost wall"): the VERIFY
# window scales INVERSELY with sf — 3s at sf1, 1s at sf3 — because the
# DuckDB-side inequality join is ~quadratic in window-by-density (the
# 3s sf3 child passed 50 min before being killed). Knob equality only
# matters within one artifact pair, so per-scale verify windows are
# sound for correctness; all four BENCH points keep the fixed 30s
# window + emb_mod=4 so tools/scaling_fit.py compares like with like.
#
# Unattended robustness: the sf3 compare runs subprocess-per-query
# (fresh allocator per child) with a 20-min kill timeout, and a q09
# ERR (the one oracle that exhausts the allocator multi-threaded) is
# retried single-threaded — fewer threads = smaller per-thread
# aggregation buffers.
set -e
cd /root/repo
export GRAFT_CP=${GRAFT_CP:-/tmp/gate_classes_r6}
export GRAFT_GATE_EMB_MOD=4

# (no rsync in this container) snapshot the classes so a concurrent
# sbt compile can't swap class files under a running JVM
rm -rf "$GRAFT_CP" && mkdir -p "$GRAFT_CP" \
  && cp -a target/scala-2.13/classes/. "$GRAFT_CP/"

sf_data () { # label copies
  [ -d "data/$1/lineitem.parquet" ] || \
    tools/run.sh graft.tools.ScaleUp /root/testdata/sf0.1 \
      "/root/repo/data/$1" "$2" > "/tmp/scaleup_$1.log" 2>&1
}
verify () { # label window_us
  rm -rf "/tmp/verify_$1"
  GRAFT_GATE_RANGE_WINDOW_US="$2" SPARK_GRAFT_CPUS=32 \
    tools/run.sh graft.Verify "/root/repo/data/$1" "/tmp/verify_$1" \
    > "/tmp/verify_$1.log" 2>&1
}
bench30 () { # sfdir outfile
  GRAFT_GATE_RANGE_WINDOW_US=30000000 SPARK_GRAFT_SF_DIR="$1" \
    tools/run.sh graft.Bench > "/tmp/bench_$(basename "$2" .json).log" 2>&1
  cp bench_last.json "$2"
}

echo "== data =="
sf_data sf0.3 3
sf_data sf1 10
sf_data sf3 30

echo "== verify sf1 (3s window) =="
verify sf1 3000000
{ echo "# gate sf1 copies=10 range_window_us=3000000 emb_mod=4 $(date -u +%FT%TZ)";
  python3 tools/compare.py /root/repo/data/sf1 /tmp/verify_sf1; } \
  | tee correctness_sf1_w3.txt

echo "== verify sf3 (1s window, subproc compare, 20min timeout) =="
verify sf3 1000000
{ echo "# gate sf3 copies=30 range_window_us=1000000 emb_mod=4 $(date -u +%FT%TZ)";
  GRAFT_COMPARE_SUBPROC=1 GRAFT_COMPARE_TIMEOUT_S=1200 \
    python3 tools/compare.py /root/repo/data/sf3 /tmp/verify_sf3; } \
  | tee correctness_sf3_w1.txt
if grep -q '^ERR  q09' correctness_sf3_w1.txt; then
  echo "== retry q09 single-threaded =="
  { echo "# q09 retry GRAFT_COMPARE_THREADS=1 $(date -u +%FT%TZ)";
    GRAFT_COMPARE_THREADS=1 python3 tools/compare.py --one \
      /root/repo/data/sf3 /tmp/verify_sf3 q09_behavioral_clustering; } \
    | tee -a correctness_sf3_w1.txt
fi

echo "== bench points (30s window, knob-identical) =="
bench30 /root/testdata/sf0.1       bench_sf0.1_knobbed.json
bench30 /root/repo/data/sf0.3      bench_sf0.3.json
bench30 /root/repo/data/sf1        bench_sf1.json
bench30 /root/repo/data/sf3        bench_sf3.json

echo "== scaling fit =="
python3 tools/scaling_fit.py sf0.1=bench_sf0.1_knobbed.json \
  sf0.3=bench_sf0.3.json sf1=bench_sf1.json sf3=bench_sf3.json \
  | tee /tmp/scaling_fit.md
echo PHASE3_DONE
