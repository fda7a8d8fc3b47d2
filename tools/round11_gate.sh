#!/bin/bash
# Round-11 evidence gate.
#
#  1. Scale correctness for round-11 new/changed queries — q50 (struct-
#     min consensus, plan change only), q114 (6-dp rank discipline, new
#     output), NEW q116 IVF / q117 LSH-shard / q118 multi-probe — PLUS
#     round-10's side-batch queries q113/q115, all APPENDED to the
#     CANONICAL per-scale artifacts (correctness_sf0.3_w3.txt,
#     correctness_sf1.txt, correctness_sf3_w3.txt, correctness_sf10.txt)
#     with a whole-file re-tally. This closes VERDICT r10 #2's
#     fragmentation: every per-scale artifact then carries a current
#     verdict for ALL 118 queries; the round-10 side files
#     (correctness_*_r10newq.txt / *_r10q115.txt, bench_newq_r10_*,
#     bench_r10q115_*) are superseded and removed in the same commit.
#  2. q66 quiet-host re-measure interleaved with q01 (VERDICT r10 #3):
#     Bench's sweep structure interleaves the two queries rep-by-rep
#     with System.gc() between, min-of-3 (+4 heavy), on an otherwise
#     idle host -> q66_remeasure_r11.txt.
#  3. Full 118-query knob-identical benches at five scale points ->
#     bench_sf{0.1,0.3,1,3,10}.json (single artifact per point, full
#     per-query map) + scaling_fit_r11.md.
#
# Discipline carried from round 9/10 gates: classes snapshotted to /tmp
# (a concurrent sbt compile cannot swap class files under a running
# JVM); every tally line SCRIPT-emitted; tee -a only ever appends to
# canonical artifacts; `|| true` on compare (exits non-zero on any bad
# row, which under set -eo pipefail would abort the remaining gates).
set -eo pipefail
cd /root/repo
CP=${GRAFT_R11_CP:-/tmp/gate_classes_r11}
rm -rf "$CP" && mkdir -p "$CP" && cp -a target/scala-2.13/classes/. "$CP/"
export GRAFT_CP="$CP"
export GRAFT_GATE_EMB_MOD=4

NEWQ=q50_consensus_verdicts,q113_fuzzy_match_counts,q114_lsh_topk,q115_pricing_summary_micro,q116_ivf_topk,q117_lsh_ann_shard,q118_lsh_multiprobe

tally () { # artifact
  python3 - "$1" <<'PY' | tee -a "$1"
import re, sys
verdict = {}
for line in open(sys.argv[1]):
    m = re.match(r'(OK   |FAIL |ERR  )(q\w+)', line)
    if m:
        verdict[m.group(2)] = m.group(1).strip()
    elif line.startswith('Q65_SF10_OK'):
        verdict['q65_neardup_groups'] = 'OK'
ok = sum(1 for v in verdict.values() if v == 'OK')
bad = len(verdict) - ok
print(f"== artifact tally: {ok} queries ok, {bad} bad ==")
PY
}

gate_sf () { # sf-label canonical-artifact
  local SF="$1" ART="$2"
  local OUT=/tmp/verify_${SF}_r11
  rm -rf "$OUT"
  SPARK_GRAFT_VERIFY_ONLY="$NEWQ" SPARK_GRAFT_CPUS=32 \
    tools/run.sh graft.Verify "/root/repo/data/$SF" "$OUT" \
    > "/tmp/verify_${SF}_r11.log" 2>&1
  { echo "# round-11 new/changed queries (q50 struct-min consensus, q114 6dp-rank, new q116/q117/q118; q113/q115 folded in from the r10 side files) emb_mod=4 $(date -u +%FT%TZ)";
    GRAFT_COMPARE_SUBPROC=1 GRAFT_COMPARE_TIMEOUT_S=1800 \
      python3 tools/compare.py "/root/repo/data/$SF" "$OUT" || true; } \
    | tee -a "$ART"
  tally "$ART"
}

echo "== correctness sf0.3 =="; gate_sf sf0.3 correctness_sf0.3_w3.txt
echo "== correctness sf1 ==";   gate_sf sf1   correctness_sf1.txt
echo "== correctness sf3 ==";   gate_sf sf3   correctness_sf3_w3.txt
echo "== correctness sf10 ==";  gate_sf sf10  correctness_sf10.txt

# --- q66 quiet-host re-measure (interleaved with the q01 control) ---
rm -f bench_last.json
SPARK_GRAFT_BENCH_ONLY=q66_zorder_curve,q01_scan_project \
  SPARK_GRAFT_SF_DIR=/root/repo/data/sf10 SPARK_GRAFT_CPUS=32 \
  tools/run.sh graft.Bench 2>/dev/null | tail -1
{ echo "# q66 sf10 quiet-host re-measure, interleaved with q01 control (VERDICT r10 #3) $(date -u +%FT%TZ)";
  cat bench_last.json; } > q66_remeasure_r11.txt

# --- five knob-identical full-suite bench points ---
bench30 () { # sfdir outfile
  rm -f bench_last.json
  GRAFT_GATE_RANGE_WINDOW_US=30000000 SPARK_GRAFT_SF_DIR="$1" \
    SPARK_GRAFT_CPUS=32 tools/run.sh graft.Bench 2>/dev/null | tail -1 \
    || true
  if [ ! -s bench_last.json ]; then
    echo "FATAL: $1 bench did not produce bench_last.json" >&2
    exit 1
  fi
  cp bench_last.json "$2"
}

echo "== bench sf0.1 =="; bench30 /root/testdata/sf0.1  bench_sf0.1.json
echo "== bench sf0.3 =="; bench30 /root/repo/data/sf0.3 bench_sf0.3.json
echo "== bench sf1 ==";   bench30 /root/repo/data/sf1   bench_sf1.json
echo "== bench sf3 ==";   bench30 /root/repo/data/sf3   bench_sf3.json
echo "== bench sf10 ==";  bench30 /root/repo/data/sf10  bench_sf10.json

git checkout -- bench_last.json 2>/dev/null || rm -f bench_last.json

python3 tools/scaling_fit.py sf0.1=bench_sf0.1.json \
  sf0.3=bench_sf0.3.json sf1=bench_sf1.json sf3=bench_sf3.json \
  sf10=bench_sf10.json | tee scaling_fit_r11.md
echo R11_GATE_DONE
