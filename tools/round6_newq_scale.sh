#!/bin/bash
# Extend the multi-point executed-scale curve to the round-6 late
# additions (q102-q109), which landed after the 101-query bench
# artifacts were frozen. Benches JUST the new queries at the same five
# points with the SAME knobs as round6_multipoint.sh / the sf10 bench
# (30s range window, emb_mod=4), then merges the timings into the
# per-sf artifacts (provenance kept in bench_newq_<sf>.json and a
# merged_subsets marker inside each artifact).
#
# q84 rides along as a re-measure: its sf3 point (10.99s) sits above
# both its sf1 (4.14s) and sf10 (5.19s) points — a nonmonotonic outlier
# this run either confirms or retires (merge takes min across runs,
# the same estimator Bench's min-of-N uses within a run).
set -e
cd /root/repo
CP=${GRAFT_NEWQ_CP:-/tmp/gate_classes_r6e}
[ -d "$CP" ] || { mkdir -p "$CP" && cp -a target/scala-2.13/classes/. "$CP/"; }
export GRAFT_CP="$CP"

NEWQ=q102_quantile_hist,q103_contamination_score,q104_kmv_distinct,q105_incremental_quantiles,q106_quantile_threshold_filter,q107_windowed_kmv_rollup,q108_stream_dedup,q109_lsh_candidate_counts,q84_unigram_lm_score

bench_newq () { # sfdir label
  echo "== newq bench $2 =="
  GRAFT_GATE_RANGE_WINDOW_US=30000000 GRAFT_GATE_EMB_MOD=4 \
    SPARK_GRAFT_BENCH_ONLY="$NEWQ" SPARK_GRAFT_SF_DIR="$1" \
    tools/run.sh graft.Bench 2>/dev/null | tail -1
  cp bench_last.json "bench_newq_$2.json"
  python3 - "$2" <<'PY'
import json, sys
label = sys.argv[1]
base = json.load(open(f"bench_{label}.json")) if label != "sf0.1" \
    else json.load(open("bench_sf0.1_knobbed.json"))
new = json.load(open(f"bench_newq_{label}.json"))
for k, v in new["queries"].items():
    base["queries"][k] = min(v, base["queries"].get(k, float("inf")))
base.setdefault("merged_subsets", []).append(
    {"file": f"bench_newq_{label}.json", "run_at": new.get("run_at")})
path = f"bench_{label}.json" if label != "sf0.1" \
    else "bench_sf0.1_knobbed.json"
json.dump(base, open(path, "w"))
print(f"merged {len(new['queries'])} queries into {path}")
PY
}

bench_newq /root/testdata/sf0.1 sf0.1
bench_newq /root/repo/data/sf0.3 sf0.3
bench_newq /root/repo/data/sf1  sf1
bench_newq /root/repo/data/sf3  sf3
bench_newq /root/repo/data/sf10 sf10

python3 tools/scaling_fit.py sf0.1=bench_sf0.1_knobbed.json \
  sf0.3=bench_sf0.3.json sf1=bench_sf1.json sf3=bench_sf3.json \
  sf10=bench_sf10.json | tee scaling_fit_r6.md
echo NEWQ_SCALE_DONE
