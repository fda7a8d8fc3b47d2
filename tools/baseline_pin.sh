#!/bin/bash
# Re-pin the BASELINE.md comparison on the CURRENT binary (VERDICT r11
# #4): runs tools/ProblemBench (per-problem canonical-query latency,
# 10-rep collect() means — the reference's methodology) and
# tools/IngestBench (cells/s on the arena ingest), converts their
# stdout lines into per-round JSON artifacts:
#   problem_bench_r{N}.json   ingest_r{N}.json
# Usage: tools/baseline_pin.sh <round>   (e.g. 12)
# Run on a quiet host; classes snapshotted so a concurrent compile
# can't swap files under the JVM.
set -eo pipefail
cd /root/repo
R="${1:?usage: baseline_pin.sh <round>}"
CP=/tmp/baseline_pin_classes
rm -rf "$CP" && mkdir -p "$CP" && cp -a target/scala-2.13/classes/. "$CP/"
export GRAFT_CP="$CP"

PB_LOG=/tmp/problem_bench_r${R}.log
SPARK_GRAFT_CPUS=32 tools/run.sh graft.tools.ProblemBench \
  2>/dev/null | tee "$PB_LOG"

python3 - "$PB_LOG" "problem_bench_r${R}.json" <<'PY'
import json, re, sys, datetime
rows, table_rows = {}, None
for line in open(sys.argv[1]):
    m = re.match(r"PROBLEM_BENCH table_rows=(\d+)", line)
    if m:
        table_rows = int(m.group(1))
    m = re.match(
        r"PROBLEM_BENCH (\S+)\s+mean=\s*([\d.]+) ms\s+p50=\s*([\d.]+)\s+"
        r"p95=\s*([\d.]+)\s+p99=\s*([\d.]+)\s+min=\s*([\d.]+)\s+"
        r"max=\s*([\d.]+)\s+\(n=(\d+), reps=(\d+)\)", line)
    if m:
        rows[m.group(1)] = {
            "mean_ms": float(m.group(2)), "p50_ms": float(m.group(3)),
            "p95_ms": float(m.group(4)), "p99_ms": float(m.group(5)),
            "min_ms": float(m.group(6)), "max_ms": float(m.group(7)),
            "n": int(m.group(8)), "reps": int(m.group(9))}
if not rows:
    sys.exit("no PROBLEM_BENCH lines parsed")
out = {"metric": "problem_bench", "table_rows": table_rows,
       "benches": rows,
       "run_at": datetime.datetime.now(datetime.timezone.utc)
                 .isoformat()}
json.dump(out, open(sys.argv[2], "w"), indent=1)
print(f"wrote {sys.argv[2]} ({len(rows)} benches)")
PY

# IngestBench writes its own self-describing JSON artifact.
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_INGEST_OUT="ingest_r${R}.json" \
  tools/run.sh graft.tools.IngestBench 2>/dev/null | grep INGEST
cat "ingest_r${R}.json"
echo BASELINE_PIN_DONE
