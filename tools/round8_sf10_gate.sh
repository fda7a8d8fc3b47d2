#!/bin/bash
# Round-8 sf10 executed-correctness gate — round-7's empty-skip-list
# shape plus the q23 de-vacuization knobs:
#   GRAFT_GATE_JACCARD_MAXDF=100 GRAFT_GATE_JACCARD_T=0.9
# At sf10 every shingle's df is a multiple of the ScaleUp replication
# (100 copies), so the default df-cap of 50 drops EVERY shingle and
# q23's row was green-but-vacuous (0 rows on both engines). With the
# cap at 100 (the base corpus's df=1 shingles) and the threshold at
# 0.9, the row verifies ~1.0M real near-identical pairs (measured
# 32 s on the DuckDB side) instead of an empty set.
# Replay paths (same rationale as round 7):
#   - q65: iterative min-label-fixpoint replay (one-shot WITH
#          RECURSIVE hits its 1800s wall in the main compare)
#   - q89: iterative integer-PageRank replay
#   - q74: iterative min-label-fixpoint replay (emb_mod-matched)
#   - q09: supplier-chunked fingerprint replay (non-spillable nested
#          list() agg OOMs the one-shot oracle)
set -e -o pipefail
cd /root/repo
CP=${GRAFT_SF10_CP:-/tmp/gate_classes_r8}
rm -rf "$CP" && mkdir -p "$CP" \
  && cp -a target/scala-2.13/classes/. "$CP/"
export GRAFT_CP="$CP"
export GRAFT_GATE_EMB_MOD=${GRAFT_GATE_EMB_MOD:-4}
export GRAFT_GATE_JACCARD_MAXDF=${GRAFT_GATE_JACCARD_MAXDF:-100}
export GRAFT_GATE_JACCARD_T=${GRAFT_GATE_JACCARD_T:-0.9}

if [ ! -d /tmp/verify_sf10/oracle_sql.json ] || [ "${GRAFT_SF10_REVERIFY:-1}" = 1 ]; then
  rm -rf /tmp/verify_sf10
  GRAFT_GATE_RANGE_WINDOW_US=300000 SPARK_GRAFT_CPUS=32 \
    tools/run.sh graft.Verify /root/repo/data/sf10 /tmp/verify_sf10 \
    > /tmp/verify_sf10.log 2>&1
fi

# Round-8-changed queries compare FIRST (q45 multiset rewrite, q97
# canonicalText Zs map + content_free, q23 knobbed threshold/df-cap,
# q110 new): if the session is cut mid-gate, the rows that gate this
# round's diffs are already in the artifact.
CHANGED=q110_multiset_key_diff,q45_set_ops_all,q97_normalized_dedup,q23_ngram_jaccard
ONLY=$(python3 - <<'PY'
import json
names = sorted(json.load(open('/tmp/verify_sf10/oracle_sql.json')))
skip = {'q09_behavioral_clustering', 'q74_semantic_dedup',
        'q89_pagerank', 'q110_multiset_key_diff', 'q45_set_ops_all',
        'q97_normalized_dedup', 'q23_ngram_jaccard'}
print(','.join(n for n in names if n not in skip))
PY
)
echo "comparing: 4 changed-first + $(echo "$ONLY" | tr ',' '\n' | wc -l) queries + 4 replay-path"
{ echo "# gate sf10 copies=100 range_window_us=300000 emb_mod=${GRAFT_GATE_EMB_MOD} jaccard_maxdf=${GRAFT_GATE_JACCARD_MAXDF} jaccard_t=${GRAFT_GATE_JACCARD_T} replays=q65,q89,q74,q09 $(date -u +%FT%TZ)";
  # `|| true`: compare exits non-zero when ANY row is bad (e.g. the
  # expected q65 one-shot-closure timeout), and this brace group is a
  # set -e subshell — without it one ERR row silently skips every
  # special-path replay below while tee's exit 0 masks the abort.
  GRAFT_COMPARE_ONLY="$CHANGED" \
  GRAFT_COMPARE_SUBPROC=1 GRAFT_COMPARE_TIMEOUT_S=1800 \
    python3 tools/compare.py /root/repo/data/sf10 /tmp/verify_sf10 \
    || true;
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
