#!/usr/bin/env python3
"""Host-speed-normalized comparison of two bench artifacts.

The shared host's speed drifts between sessions (measured ~1.5x swings
across a round). A raw per-query diff against an artifact recorded in a
different session therefore flags half the suite. This tool estimates
the host factor as the MEDIAN per-query time ratio new/old over all
queries timed in both artifacts — the median is robust because a
directed fix or regression moves a handful of queries while host speed
moves all of them — then reports each query's ratio normalized by that
factor. Outliers vs the factor are the real signal.

Usage: host_factor.py old.json new.json [threshold]
  threshold (default 1.5): flag queries whose normalized ratio falls
  outside [1/threshold, threshold].

Refuses to compare artifacts with different gate knobs — those timings
measure different work by construction.
"""
import json, sys


def load(path):
    d = json.load(open(path))
    return d.get("knobs"), {k: v for k, v in d["queries"].items() if v > 0}


def main(argv):
    old_p, new_p = argv[0], argv[1]
    thr = float(argv[2]) if len(argv) > 2 else 1.5
    ok, oq = load(old_p)
    nk, nq = load(new_p)
    if ok is not None and nk is not None and ok != nk:
        sys.exit(f"knob mismatch: {old_p}={ok} vs {new_p}={nk}; "
                 "timings are not comparable")
    common = sorted(set(oq) & set(nq))
    ratios = sorted(nq[q] / oq[q] for q in common)
    factor = ratios[len(ratios) // 2]
    print(f"host factor (median new/old over {len(common)} queries): "
          f"{factor:.2f}x")
    rows = [(q, (nq[q] / oq[q]) / factor, oq[q], nq[q]) for q in common]
    flagged = [r for r in rows if r[1] > thr or r[1] < 1 / thr]
    flagged.sort(key=lambda r: -r[1])
    if not flagged:
        print(f"no query outside [{1/thr:.2f}, {thr:.2f}] "
              "after host normalization")
        return
    print(f"| query | norm ratio | old s | new s |")
    print("|---|---|---|---|")
    for q, r, o, n in flagged:
        print(f"| {q} | {r:.2f} | {o:.2f} | {n:.2f} |")


if __name__ == "__main__":
    main(sys.argv[1:])
