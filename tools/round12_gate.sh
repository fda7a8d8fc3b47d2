#!/bin/bash
# Round-12 evidence gate.
#
#  1. Scale correctness for round-12 new/changed queries — q114/q117
#     (lshTopK: one-shot dims pre-flight replacing the per-row guard;
#     q117 additionally exercises the salted-capable shuffle path),
#     q118 (second-ring multi-probe: the probing sequence now includes
#     two-bit flips, so probe SETS changed), NEW q119 (recall-aware
#     annTopK selector, decision replayed in SQL) and NEW q120
#     (quantized-scan IVF: q116's probe chain, int8 candidate scan) —
#     APPENDED to the canonical per-scale artifacts with a whole-file
#     re-tally, the round-11 discipline.
#  2. Five knob-identical full-suite bench points ->
#     bench_sf{0.1,0.3,1,3,10}.json + scaling_fit_r12.md. Knobs stay at
#     the gate values (range_window_us=3e7, emb_mod=4) so the matrix is
#     directly comparable with every prior round's matrix; VERDICT r11
#     #6 is closed by (a) the knob-equality assert below and (b)
#     tools/bench_diff.py now being knob-aware (it auto-excludes the
#     queries a differing knob parameterizes), so driver-vs-matrix
#     diffs no longer need mental normalization.
#  3. Knob-equality assert across the five matrix artifacts: refuses to
#     emit a scaling fit over mixed-knob points.
#
# Discipline carried from round 9/10/11 gates: classes snapshotted to
# /tmp (a concurrent sbt compile cannot swap class files under a
# running JVM); every tally line SCRIPT-emitted; tee -a only ever
# appends to canonical artifacts; `|| true` on compare (exits non-zero
# on any bad row, which under set -eo pipefail would abort the
# remaining gates).
set -eo pipefail
cd /root/repo
CP=${GRAFT_R12_CP:-/tmp/gate_classes_r12}
rm -rf "$CP" && mkdir -p "$CP" && cp -a target/scala-2.13/classes/. "$CP/"
export GRAFT_CP="$CP"
export GRAFT_GATE_EMB_MOD=4

NEWQ=q114_lsh_topk,q117_lsh_ann_shard,q118_lsh_multiprobe,q119_ann_selector,q120_ivf_topk_quantized

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
  local OUT=/tmp/verify_${SF}_r12
  rm -rf "$OUT"
  SPARK_GRAFT_VERIFY_ONLY="$NEWQ" SPARK_GRAFT_CPUS=32 \
    tools/run.sh graft.Verify "/root/repo/data/$SF" "$OUT" \
    > "/tmp/verify_${SF}_r12.log" 2>&1
  { echo "# round-12 new/changed queries (q114/q117 dims pre-flight, q118 second-ring probe sequence, NEW q119 annTopK selector) emb_mod=4 $(date -u +%FT%TZ)";
    GRAFT_COMPARE_SUBPROC=1 GRAFT_COMPARE_TIMEOUT_S=1800 \
      python3 tools/compare.py "/root/repo/data/$SF" "$OUT" || true; } \
    | tee -a "$ART"
  tally "$ART"
}

echo "== correctness sf0.3 =="; gate_sf sf0.3 correctness_sf0.3_w3.txt
echo "== correctness sf1 ==";   gate_sf sf1   correctness_sf1.txt
echo "== correctness sf3 ==";   gate_sf sf3   correctness_sf3_w3.txt
echo "== correctness sf10 ==";  gate_sf sf10  correctness_sf10.txt

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

# --- knob-equality assert (VERDICT r11 #6): a scaling fit over
# mixed-knob points measures different work at different scales ---
python3 - <<'PY'
import json, sys
knobs = {}
for sf in ["0.1", "0.3", "1", "3", "10"]:
    d = json.load(open(f"bench_sf{sf}.json"))
    k = dict(d["knobs"])
    k.pop("init_parts", None)  # size-gated by design; rides for info
    knobs[sf] = k
vals = list(knobs.values())
if any(v != vals[0] for v in vals):
    sys.exit(f"KNOB MISMATCH across matrix artifacts: {knobs}")
print(f"knob equality across 5 matrix points OK: {vals[0]}")
PY

python3 tools/scaling_fit.py sf0.1=bench_sf0.1.json \
  sf0.3=bench_sf0.3.json sf1=bench_sf1.json sf3=bench_sf3.json \
  sf10=bench_sf10.json | tee scaling_fit_r12.md
echo R12_GATE_DONE
