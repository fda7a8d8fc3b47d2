#!/bin/bash
# sf1 executed-scale evidence: generate 10x data, run the full oracle
# gate (graft.Verify + DuckDB compare) and the bench suite at sf1.
# Artifacts: data/sf1/ (generated, gitignored), /tmp/verify_sf1/,
# correctness_sf1.txt, bench_sf1.json.
set -e
cd /root/repo
SF1=/root/repo/data/sf1

if [ ! -d "$SF1/lineitem.parquet" ]; then
  sbt "runMain graft.tools.ScaleUp /root/testdata/sf0.1 $SF1 10"
fi

SPARK_GRAFT_CPUS=32 sbt "runMain graft.Verify $SF1 /tmp/verify_sf1"
python3 tools/compare.py "$SF1" /tmp/verify_sf1 | tee correctness_sf1.txt

SPARK_GRAFT_SF_DIR=$SF1 sbt "runMain graft.Bench" 2>&1 | tail -2
cp bench_last.json bench_sf1.json
