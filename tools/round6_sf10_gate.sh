#!/bin/bash
# 100x executed-correctness gate: verify + DuckDB-compare the oracle
# suite at sf10 (100x the bench base point, 60M lineitem / 10M events
# / 500k docs).
#
# The Spark side runs EVERY declared query; the skip list below applies
# only to the DuckDB compare, each exclusion with a named oracle-side
# cause (PLANS.md "sf3 DuckDB-oracle cost wall"):
#   q09  recursive clustering replay exhausts the allocator (sf3
#        needed a single-threaded retry; sf10 is 3.3x that)
#   q74  recursive-CTE semantic-dedup replay, same class
#   q89  3-iteration PageRank CTE chain was 84s in-db at sf3 (~10min+
#        at sf10)
# Window policy: inverse with sf (3s@sf1 / 1s@sf3) -> 0.3s@sf10 keeps
# the q39/q76 pair count at ~the sf1-gate load.
set -e
cd /root/repo
CP=${GRAFT_SF10_CP:-/tmp/gate_classes_r6d}
rm -rf "$CP" && mkdir -p "$CP" \
  && cp -a target/scala-2.13/classes/. "$CP/"
export GRAFT_CP="$CP"
export GRAFT_GATE_EMB_MOD=${GRAFT_GATE_EMB_MOD:-4}

rm -rf /tmp/verify_sf10
GRAFT_GATE_RANGE_WINDOW_US=300000 SPARK_GRAFT_CPUS=32 \
  tools/run.sh graft.Verify /root/repo/data/sf10 /tmp/verify_sf10 \
  > /tmp/verify_sf10.log 2>&1

# compare everything the dump declared, minus the named skip list
ONLY=$(python3 - <<'PY'
import json
names = sorted(json.load(open('/tmp/verify_sf10/oracle_sql.json')))
skip = {'q09_behavioral_clustering', 'q74_semantic_dedup',
        'q89_pagerank'}
print(','.join(n for n in names if n not in skip))
PY
)
echo "comparing: $(echo "$ONLY" | tr ',' '\n' | wc -l) queries"
{ echo "# gate sf10 copies=100 range_window_us=300000 emb_mod=${GRAFT_GATE_EMB_MOD} skip=q09,q74,q89 $(date -u +%FT%TZ)";
  GRAFT_COMPARE_ONLY="$ONLY" \
  GRAFT_COMPARE_SUBPROC=1 GRAFT_COMPARE_TIMEOUT_S=1800 \
    python3 tools/compare.py /root/repo/data/sf10 /tmp/verify_sf10; } \
  | tee correctness_sf10.txt
echo SF10_GATE_DONE
