#!/bin/bash
# Round-7 sf10 executed-correctness gate with an EMPTY skip list
# (VERDICT r6 item 4 asked for <= 1):
#   - main compare: every declared oracle except q09/q74/q89
#   - q65: iterative min-label-fixpoint replay (the declared one-shot
#          WITH RECURSIVE closure hits its documented 1800s wall in
#          the main compare — the ERR there is expected; the replay
#          line is the verdict)
#   - q89: iterative integer-PageRank replay (tools/q89_replay.py)
#   - q74: iterative min-label-fixpoint replay (tools/q74_replay.py,
#          emb_mod matching the Spark dump)
#   - q09: supplier-chunked fingerprint replay (tools/q09_replay.py)
#          — the one-shot nested list() aggregation is non-spillable
#          and OOMs the allocator even at GRAFT_COMPARE_THREADS=1.
set -e -o pipefail
cd /root/repo
CP=${GRAFT_SF10_CP:-/tmp/gate_classes_r7}
rm -rf "$CP" && mkdir -p "$CP" \
  && cp -a target/scala-2.13/classes/. "$CP/"
export GRAFT_CP="$CP"
export GRAFT_GATE_EMB_MOD=${GRAFT_GATE_EMB_MOD:-4}

if [ ! -d /tmp/verify_sf10/oracle_sql.json ] || [ "${GRAFT_SF10_REVERIFY:-1}" = 1 ]; then
  rm -rf /tmp/verify_sf10
  GRAFT_GATE_RANGE_WINDOW_US=300000 SPARK_GRAFT_CPUS=32 \
    tools/run.sh graft.Verify /root/repo/data/sf10 /tmp/verify_sf10 \
    > /tmp/verify_sf10.log 2>&1
fi

ONLY=$(python3 - <<'PY'
import json
names = sorted(json.load(open('/tmp/verify_sf10/oracle_sql.json')))
skip = {'q09_behavioral_clustering', 'q74_semantic_dedup',
        'q89_pagerank'}
print(','.join(n for n in names if n not in skip))
PY
)
echo "comparing: $(echo "$ONLY" | tr ',' '\n' | wc -l) queries + 4 replay-path"
{ echo "# gate sf10 copies=100 range_window_us=300000 emb_mod=${GRAFT_GATE_EMB_MOD} replays=q65,q89,q74,q09 $(date -u +%FT%TZ)";
  # `|| true`: compare exits non-zero when ANY row is bad (e.g. the
  # expected q65 one-shot-closure timeout), and this brace group is a
  # set -e subshell — without it one ERR row silently skips every
  # special-path replay below while tee's exit 0 masks the abort.
  GRAFT_COMPARE_ONLY="$ONLY" \
  GRAFT_COMPARE_SUBPROC=1 GRAFT_COMPARE_TIMEOUT_S=1800 \
    python3 tools/compare.py /root/repo/data/sf10 /tmp/verify_sf10 \
    || true;
  python3 tools/q65_sf10_replay.py /root/repo/data/sf10 /tmp/verify_sf10 \
    | tail -1 || true;
  python3 tools/q89_replay.py /root/repo/data/sf10 /tmp/verify_sf10 \
    | tail -1 || echo "ERR  q89_pagerank: replay failed";
  python3 tools/q74_replay.py /root/repo/data/sf10 /tmp/verify_sf10 \
    "${GRAFT_GATE_EMB_MOD}" | tail -1 \
    || echo "ERR  q74_semantic_dedup: replay failed";
  python3 tools/q09_replay.py /root/repo/data/sf10 /tmp/verify_sf10 16 \
    | tail -1 \
    || echo "ERR  q09_behavioral_clustering: replay failed"; } \
  | tee correctness_sf10.txt
echo SF10_GATE_DONE
