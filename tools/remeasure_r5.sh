#!/bin/bash
# VERDICT r5 item 3: directed re-measure of the sf0.1 timings that
# regressed in the round-5 artifact (q55 0.71->1.24s, q45 0.61->0.86s,
# q26 +0.16s, q71). Three full sweeps of ONLY these queries (plus the
# round's q55 fix already in tree) on an otherwise idle host; numbers
# are only comparable to runs under the same isolation.
set -e
cd /root/repo
Q=q55_grouping_sets,q45_set_ops_all,q26_embedding_neardup,q71_gapfill_resample
for i in 1 2 3; do
  SPARK_GRAFT_BENCH_ONLY=$Q SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    tools/run.sh graft.Bench 2>/dev/null | tr -d '\000' | grep '"metric"' \
    > /tmp/remeasure_run$i.json
  echo "run $i: $(cat /tmp/remeasure_run$i.json | python3 -c '
import json,sys; d=json.load(sys.stdin); print(d["queries"])')"
done
