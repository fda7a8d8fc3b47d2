#!/bin/bash
# Round-6 phase 2: sf3 gate + equal-knob bench points.
#
# Knob split (recorded in every artifact): the VERIFY/oracle pass at
# sf3 uses a 3s range window — q76/q39's DuckDB-side inequality join
# is ~quadratic in window-by-density, and 30s at sf3 was measured
# headed for hours (626s at sf1) — while every BENCH run keeps the
# 30s window, so the four bench points (sf0.1/0.3/1/3) stay
# knob-identical for tools/scaling_fit.py. Bench never runs DuckDB;
# verify-vs-bench knob inequality is harmless, cross-point bench
# inequality is not.
cd /root/repo
export GRAFT_CP=${GRAFT_CP:-/tmp/gate_classes_r6}
export GRAFT_GATE_EMB_MOD=4
set -e

DIR=/root/repo/data/sf3
echo "== scaleup sf3 =="
[ -d "$DIR/lineitem.parquet" ] || \
  tools/run.sh graft.tools.ScaleUp /root/testdata/sf0.1 "$DIR" 30 \
    > /tmp/scaleup_sf3.log 2>&1

echo "== verify sf3 (3s window) =="
rm -rf /tmp/verify_sf3
GRAFT_GATE_RANGE_WINDOW_US=3000000 SPARK_GRAFT_CPUS=32 \
  tools/run.sh graft.Verify "$DIR" /tmp/verify_sf3 > /tmp/verify_sf3.log 2>&1
{ echo "# gate sf3 copies=30 range_window_us=3000000 emb_mod=4 $(date -u +%FT%TZ)";
  python3 tools/compare.py "$DIR" /tmp/verify_sf3; } \
  | tee correctness_sf3.txt

echo "== bench sf3 (30s window) =="
GRAFT_GATE_RANGE_WINDOW_US=30000000 SPARK_GRAFT_SF_DIR=$DIR \
  tools/run.sh graft.Bench > /tmp/bench_sf3.log 2>&1
cp bench_last.json bench_sf3.json

echo "== bench sf0.3 (30s window) =="
[ -d data/sf0.3/lineitem.parquet ] || \
  tools/run.sh graft.tools.ScaleUp /root/testdata/sf0.1 /root/repo/data/sf0.3 3 \
    > /tmp/scaleup_sf03.log 2>&1
GRAFT_GATE_RANGE_WINDOW_US=30000000 SPARK_GRAFT_SF_DIR=/root/repo/data/sf0.3 \
  tools/run.sh graft.Bench > /tmp/bench_sf03.log 2>&1
cp bench_last.json bench_sf0.3.json

echo "== bench sf0.1 (30s window) =="
GRAFT_GATE_RANGE_WINDOW_US=30000000 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  tools/run.sh graft.Bench > /tmp/bench_sf01k.log 2>&1
cp bench_last.json bench_sf0.1_knobbed.json
echo PHASE2_DONE
