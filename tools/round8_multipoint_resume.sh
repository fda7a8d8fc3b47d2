#!/bin/bash
# Resume of round8_multipoint.sh from the bench phase: the first run
# completed both verify gates (sf0.3 110/110; sf3 110/110 after the
# threads=1 q09 re-run) and then aborted on the unguarded compare exit
# status before any bench ran. Same binary snapshot, same knobs.
set -eo pipefail
cd /root/repo
export GRAFT_CP=${GRAFT_MP_CP:-/tmp/gate_classes_r8mp}
export GRAFT_GATE_EMB_MOD=4

bench30 () { # sfdir outfile
  rm -f bench_last.json
  GRAFT_GATE_RANGE_WINDOW_US=30000000 SPARK_GRAFT_SF_DIR="$1" \
    tools/run.sh graft.Bench 2>/dev/null | tail -1
  if [ ! -s bench_last.json ]; then
    echo "FATAL: $1 bench did not produce bench_last.json" >&2
    exit 1
  fi
  cp bench_last.json "$2"
}

echo "== bench sf0.1 =="; bench30 /root/testdata/sf0.1  bench_sf0.1_knobbed.json
echo "== bench sf0.3 =="; bench30 /root/repo/data/sf0.3 bench_sf0.3.json
echo "== bench sf1 ==";   bench30 /root/repo/data/sf1   bench_sf1.json
echo "== bench sf3 ==";   bench30 /root/repo/data/sf3   bench_sf3.json
echo "== bench sf10 ==";  bench30 /root/repo/data/sf10  bench_sf10.json

# Restore-or-drop (ADVICE r8): a bare `git checkout` on an untracked
# path fails and aborts the script under set -eo pipefail.
git checkout -- bench_last.json 2>/dev/null || rm -f bench_last.json

python3 tools/scaling_fit.py sf0.1=bench_sf0.1_knobbed.json \
  sf0.3=bench_sf0.3.json sf1=bench_sf1.json sf3=bench_sf3.json \
  sf10=bench_sf10.json | tee scaling_fit_r8.md
echo MULTIPOINT_DONE
