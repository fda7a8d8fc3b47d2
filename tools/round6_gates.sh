#!/bin/bash
# Round-6 multi-point executed-scale evidence: gates at sf1 and sf3,
# plus equal-knob bench points at sf0.1 and sf0.3 so the scaling fit
# (tools/scaling_fit.py) gets four comparable points. Knob values are
# pinned here once; every artifact below embeds them.
cd /root/repo
export GRAFT_CP=${GRAFT_CP:-/tmp/gate_classes_r6}
export GRAFT_GATE_RANGE_WINDOW_US=30000000
export GRAFT_GATE_EMB_MOD=4

set -e
echo "== gate sf1 =="
tools/gate.sh sf1 10 > /tmp/gate_sf1.log 2>&1
echo "== gate sf3 =="
tools/gate.sh sf3 30 > /tmp/gate_sf3.log 2>&1

echo "== bench sf0.3 (equal knobs) =="
[ -d data/sf0.3/lineitem.parquet ] || \
  tools/run.sh graft.tools.ScaleUp /root/testdata/sf0.1 /root/repo/data/sf0.3 3 \
    > /tmp/gate_extra.log 2>&1
SPARK_GRAFT_SF_DIR=/root/repo/data/sf0.3 tools/run.sh graft.Bench \
  >> /tmp/gate_extra.log 2>&1
cp bench_last.json bench_sf0.3.json

echo "== bench sf0.1 (equal knobs) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh graft.Bench \
  >> /tmp/gate_extra.log 2>&1
cp bench_last.json bench_sf0.1_knobbed.json
echo GATES_ALL_DONE
