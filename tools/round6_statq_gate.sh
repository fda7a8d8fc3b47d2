#!/bin/bash
# Executed-scale gate for the round-6 q102-q104 batch: verify + compare
# ONLY the new queries at sf1 and sf3 (the full-suite artifacts from
# phase 3 predate the batch), appending to the per-scale w-files.
# Windows match the phase-3 policy (3s at sf1 / 1s at sf3) for
# artifact consistency; none of q102-q104 reads the range window, so
# the knob only matters for the file header's honesty.
set -e
cd /root/repo
CP=${GRAFT_STATQ_CP:-/tmp/gate_classes_r6c}
rm -rf "$CP" && mkdir -p "$CP" \
  && cp -a target/scala-2.13/classes/. "$CP/"
export GRAFT_CP="$CP"
export GRAFT_GATE_EMB_MOD=4
NEWQ=${GRAFT_STATQ_ONLY:-q102,q103,q104}

gate () { # label window_us outfile
  rm -rf "/tmp/verify_$1_statq"
  GRAFT_GATE_RANGE_WINDOW_US="$2" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_VERIFY_ONLY=$NEWQ \
    tools/run.sh graft.Verify "/root/repo/data/$1" "/tmp/verify_$1_statq" \
    > "/tmp/verify_$1_statq.log" 2>&1
  { echo "# ${GRAFT_STATQ_ONLY:-q102-q104} batch $1 $(date -u +%FT%TZ)";
    GRAFT_COMPARE_SUBPROC=1 GRAFT_COMPARE_TIMEOUT_S=1200 \
      python3 tools/compare.py "/root/repo/data/$1" "/tmp/verify_$1_statq"; } \
    | tee -a "$3"
}

gate sf1 3000000 correctness_sf1_w3.txt
gate sf3 1000000 correctness_sf3_w1.txt
echo STATQ_GATE_DONE
