#!/bin/bash
# Round-9 sf10 executed-correctness gate. Closes round 8's only material
# evidence gap (VERDICT r8 #1): the committed correctness_sf10.txt was
# round-7 code, so the queries rounds 8-9 changed (q45 count-arithmetic
# multiset form, new q110, q97 Zs-aware canonicalText + content_free,
# knobbed q23, new q111 content_free consumer) had no sf10 row.
#
# Same shape as round8_sf10_gate.sh:
#   - q23 de-vacuization knobs (maxdf=100 / t=0.9: at sf10 every
#     shingle's df is a multiple of the 100x ScaleUp replication, so the
#     default df-cap of 50 drops EVERY shingle -> 0-row vacuous green)
#   - changed-queries-first ordering, so a cut session still lands the
#     rows that gate this round's diffs
#   - replay paths for the oracles that cannot run one-shot at sf10:
#     q65/q74 (iterative min-label fixpoint vs a WITH RECURSIVE that
#     hits the 1800s wall), q89 (iterative integer PageRank), q09
#     (supplier-chunked: the nested non-spillable list() agg OOMs even
#     a threads=1 one-shot at sf10 — compare.py's new threads=1 heavy
#     routing covers sf3, not this)
#   - NEW: the final tally over the whole artifact is SCRIPT-emitted
#     (ADVICE r8: round-8's sf3 artifact carried a hand-edited re-tally
#     line; tool-emitted lines must come from tools)
set -e -o pipefail
cd /root/repo
CP=${GRAFT_SF10_CP:-/tmp/gate_classes_r9}
rm -rf "$CP" && mkdir -p "$CP" \
  && cp -a target/scala-2.13/classes/. "$CP/"
export GRAFT_CP="$CP"
export GRAFT_GATE_EMB_MOD=${GRAFT_GATE_EMB_MOD:-4}
export GRAFT_GATE_JACCARD_MAXDF=${GRAFT_GATE_JACCARD_MAXDF:-100}
export GRAFT_GATE_JACCARD_T=${GRAFT_GATE_JACCARD_T:-0.9}

if [ ! -f /tmp/verify_sf10/oracle_sql.json ] || [ "${GRAFT_SF10_REVERIFY:-1}" = 1 ]; then
  rm -rf /tmp/verify_sf10
  GRAFT_GATE_RANGE_WINDOW_US=300000 SPARK_GRAFT_CPUS=32 \
    tools/run.sh graft.Verify /root/repo/data/sf10 /tmp/verify_sf10 \
    > /tmp/verify_sf10.log 2>&1
fi

CHANGED=q112_salted_join,q111_curation_decisions,q110_multiset_key_diff,q45_set_ops_all,q97_normalized_dedup,q23_ngram_jaccard
ONLY=$(python3 - <<'PY'
import json
names = sorted(json.load(open('/tmp/verify_sf10/oracle_sql.json')))
skip = {'q09_behavioral_clustering', 'q74_semantic_dedup',
        'q89_pagerank', 'q65_neardup_groups', 'q112_salted_join',
        'q111_curation_decisions', 'q110_multiset_key_diff',
        'q45_set_ops_all', 'q97_normalized_dedup', 'q23_ngram_jaccard'}
print(','.join(n for n in names if n not in skip))
PY
)
echo "comparing: 5 changed-first + $(echo "$ONLY" | tr ',' '\n' | wc -l) queries + 4 replay-path"
{ echo "# gate sf10 copies=100 range_window_us=300000 emb_mod=${GRAFT_GATE_EMB_MOD} jaccard_maxdf=${GRAFT_GATE_JACCARD_MAXDF} jaccard_t=${GRAFT_GATE_JACCARD_T} replays=q65,q89,q74,q09 $(date -u +%FT%TZ)";
  # `|| true`: compare exits non-zero when ANY row is bad, and this
  # brace group is a set -e subshell — without the guard one ERR row
  # silently skips every replay below while tee's exit 0 masks it.
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
# Script-emitted whole-artifact tally: the per-invocation "== N ok,
# M bad ==" lines above each cover only their own GRAFT_COMPARE_ONLY
# slice; this one counts every query row in the final artifact.
python3 - <<'PY' | tee -a correctness_sf10.txt
# Per-QUERY tally, last verdict wins (a re-run OK supersedes its ERR);
# the q65 replay emits Q65_SF10_OK rather than an "OK   q65..." line.
import re
verdict = {}
for line in open('correctness_sf10.txt'):
    m = re.match(r'(OK   |FAIL |ERR  )(q\w+)', line)
    if m:
        verdict[m.group(2)] = m.group(1).strip()
    elif line.startswith('Q65_SF10_OK'):
        verdict['q65_neardup_groups'] = 'OK'
ok = sum(1 for v in verdict.values() if v == 'OK')
bad = len(verdict) - ok
print(f"== artifact tally: {ok} queries ok, {bad} bad ==")
PY
echo SF10_GATE_DONE
