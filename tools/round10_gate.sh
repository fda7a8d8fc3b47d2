#!/bin/bash
# Round-10 evidence gate. Closes VERDICT r9 #1's last cell (q112 had no
# sf10 row — the round-9 gate's class snapshot predated it) and extends
# the executed-scale matrix to the two queries added this round:
#   q113_fuzzy_match_counts — q73's pair-free aggregate consumer
#   q114_lsh_topk           — the formerly spec-only ANN path
#
# Discipline carried over from round9_sf10_gate.sh:
#   - classes snapshotted to /tmp so a concurrent sbt compile can't swap
#     class files under the running JVM
#   - every tally line is SCRIPT-emitted (ADVICE r8: committed artifacts
#     must be byte-reproducible by re-running the tool)
#   - sf10 additions APPEND to correctness_sf10.txt and the whole-file
#     re-tally runs afterwards, so the canonical artifact carries one
#     current per-query verdict map
set -eo pipefail
cd /root/repo
CP=${GRAFT_R10_CP:-/tmp/gate_classes_r10}
rm -rf "$CP" && mkdir -p "$CP" \
  && cp -a target/scala-2.13/classes/. "$CP/"
export GRAFT_CP="$CP"

# Default: the round's first new-query batch; override for later
# batches (q115 was added after the first full gate run).
NEWQ=${GRAFT_R10_NEWQ:-q113_fuzzy_match_counts,q114_lsh_topk}
# Artifact suffix per batch so a later batch never clobbers an earlier
# batch's committed rows (tee without -a was the round-9 zombie bug).
TAG=${GRAFT_R10_TAG:-r10newq}

# GRAFT_R10_SF10_ONLY=1 re-runs just the sf10 compare + tally against an
# existing /tmp/verify_sf10_r10 dump. Added after a leftover nohup'd
# round-9 gate from the PREVIOUS session truncated correctness_sf10.txt
# (its tee has no -a) minutes after this script appended to it — the
# recovery is git-restore + re-running this slice, never hand-editing.
if [ "${GRAFT_R10_SF10_ONLY:-0}" != 1 ]; then
for SF in 0.3 1 3; do
  OUT=/tmp/verify_sf${SF}_r10
  rm -rf "$OUT"
  SPARK_GRAFT_VERIFY_ONLY="$NEWQ" SPARK_GRAFT_CPUS=32 \
    tools/run.sh graft.Verify /root/repo/data/sf$SF "$OUT" \
    > /tmp/verify_sf${SF}_r10.log 2>&1
  { echo "# round-10 new-query gate sf$SF $(date -u +%FT%TZ)";
    GRAFT_COMPARE_SUBPROC=1 GRAFT_COMPARE_TIMEOUT_S=1800 \
      python3 tools/compare.py /root/repo/data/sf$SF "$OUT" || true; } \
    | tee "correctness_sf${SF}_${TAG}.txt"
done
fi

OUT=${GRAFT_R10_SF10_OUT:-/tmp/verify_sf10_r10}
if [ "${GRAFT_R10_SF10_ONLY:-0}" != 1 ] || [ ! -f "$OUT/oracle_sql.json" ]; then
  rm -rf "$OUT"
  SPARK_GRAFT_VERIFY_ONLY="${GRAFT_R10_COMPARE_ONLY:-${GRAFT_R10_NEWQ:-q112_salted_join,$NEWQ}}" \
    SPARK_GRAFT_CPUS=32 \
    tools/run.sh graft.Verify /root/repo/data/sf10 "$OUT" \
    > /tmp/verify_sf10_r10.log 2>&1
fi
# GRAFT_R10_COMPARE_ONLY narrows the sf10 compare to named queries (for
# final-binary reconciliation of a query whose op changed after the full
# dump ran — the dump for those queries must be refreshed first).
{ echo "# round-10 additions (q112 on the shipped binary; new q113/q114)${GRAFT_R10_COMPARE_ONLY:+ [only: $GRAFT_R10_COMPARE_ONLY]} $(date -u +%FT%TZ)";
  GRAFT_COMPARE_ONLY="${GRAFT_R10_COMPARE_ONLY:-}" \
  GRAFT_COMPARE_SUBPROC=1 GRAFT_COMPARE_TIMEOUT_S=1800 \
    python3 tools/compare.py /root/repo/data/sf10 "$OUT" || true; } \
  | tee -a correctness_sf10.txt

# Whole-artifact re-tally, last verdict per query wins (identical logic
# to round9_sf10_gate.sh — the committed tally is always tool-emitted).
python3 - <<'PY' | tee -a correctness_sf10.txt
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

# Bench points for the two new queries at every committed scale
# (bench_newq_r10_sf*.json; bench_last.json is per-run scratch).
if [ "${GRAFT_R10_SF10_ONLY:-0}" != 1 ]; then
for SF in 0.3 1 3 10; do
  rm -f bench_last.json
  SPARK_GRAFT_BENCH_ONLY="$NEWQ" SPARK_GRAFT_SF_DIR=/root/repo/data/sf$SF \
    SPARK_GRAFT_CPUS=32 tools/run.sh graft.Bench \
    > "/tmp/bench_${TAG}_sf$SF.log" 2>&1 || true
  if [ -s bench_last.json ]; then
    cp bench_last.json "bench_${TAG}_sf$SF.json"
  else
    echo "FATAL: sf$SF new-query bench produced no bench_last.json" >&2
    exit 1
  fi
done
fi
echo R10_GATE_DONE
