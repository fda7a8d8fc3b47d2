#!/bin/bash
# Round-6 multi-point executed-scale evidence, fast-gate edition.
#
# VERIFY passes run a 3s range window (GRAFT_GATE_RANGE_WINDOW_US):
# the DuckDB-side inequality join for q39/q76 is ~quadratic in
# window-by-density (626s at sf1 with the 30s window — measured), and
# the 3s window keeps the whole two-scale oracle gate under ~10 min so
# it stays in the default loop (round-5 verdict item 5). The 30s-window
# sf1 correctness artifact from earlier this round is kept as
# correctness_sf1.txt; the fast gates write *_w3 files.
#
# BENCH passes all run the 30s window + emb_mod=4 — knob-identical
# across sf0.1/0.3/1/3 so tools/scaling_fit.py compares like with like.
set -e
cd /root/repo
export GRAFT_CP=${GRAFT_CP:-/tmp/gate_classes_r6}
export GRAFT_GATE_EMB_MOD=4

sf_data () { # label copies
  [ -d "data/$1/lineitem.parquet" ] || \
    tools/run.sh graft.tools.ScaleUp /root/testdata/sf0.1 "/root/repo/data/$1" "$2"
}
verify3 () { # label
  rm -rf "/tmp/verify_$1"
  GRAFT_GATE_RANGE_WINDOW_US=3000000 SPARK_GRAFT_CPUS=32 \
    tools/run.sh graft.Verify "/root/repo/data/$1" "/tmp/verify_$1"
  { echo "# gate $1 range_window_us=3000000 emb_mod=4 $(date -u +%FT%TZ)";
    python3 tools/compare.py "/root/repo/data/$1" "/tmp/verify_$1"; } \
    | tee "correctness_${1}_w3.txt"
}
bench30 () { # sfdir outfile
  GRAFT_GATE_RANGE_WINDOW_US=30000000 SPARK_GRAFT_SF_DIR="$1" \
    tools/run.sh graft.Bench 2>/dev/null | tail -1
  cp bench_last.json "$2"
}

echo "== sf1 data ==";  sf_data sf1 10
echo "== sf3 data ==";  sf_data sf3 30
echo "== sf0.3 data =="; sf_data sf0.3 3

echo "== verify sf1 (3s window) ==";  verify3 sf1
echo "== verify sf3 (3s window) ==";  verify3 sf3

echo "== bench sf1 ==";   bench30 /root/repo/data/sf1   bench_sf1.json
echo "== bench sf3 ==";   bench30 /root/repo/data/sf3   bench_sf3.json
echo "== bench sf0.3 =="; bench30 /root/repo/data/sf0.3 bench_sf0.3.json
echo "== bench sf0.1 =="; bench30 /root/testdata/sf0.1  bench_sf0.1_knobbed.json

python3 tools/scaling_fit.py sf0.1=bench_sf0.1_knobbed.json \
  sf0.3=bench_sf0.3.json sf1=bench_sf1.json sf3=bench_sf3.json \
  | tee /tmp/scaling_fit.md
echo MULTIPOINT_DONE
