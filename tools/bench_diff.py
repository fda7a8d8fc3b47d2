#!/usr/bin/env python3
"""Per-query regression diff between two Bench JSON lines.

Usage: python3 tools/bench_diff.py BENCH_r01.json BENCH_r02.json [ratio]

Flags queries slower than `ratio` (default 1.3) in the newer file and
prints the largest movers both ways. A -1 value (failed query) is
always flagged.
"""
import json
import re
import sys


def load(path):
    """Accept either a bare Bench line or the driver's BENCH_r{N}.json
    wrapper (bench line embedded, escaped, in a "tail" field)."""
    with open(path) as f:
        text = f.read()
    doc = json.loads(text)
    if "queries" in doc:
        return doc
    embedded = doc.get("tail", text)
    m = re.search(r'\{"metric":.*?"queries":\{.*?\}.*?\}', embedded)
    if not m:
        raise SystemExit(f"{path}: no bench line found")
    return json.loads(m.group(0).encode().decode("unicode_escape")
                      if "\\\"" in m.group(0) else m.group(0))


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    bar = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    oq, nq = old["queries"], new["queries"]
    rows = []
    added, removed = [], []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None:
            added.append(name)
        elif b is None:
            removed.append(name)
        elif b < 0:
            rows.append((float("inf"), name, a, b, "FAILED"))
        elif a > 0:
            rows.append((b / a, name, a, b, ""))
    regressions = [r for r in rows if r[0] > bar]
    print(f"total: {old.get('value', 0):.1f}s -> {new.get('value', 0):.1f}s")
    if added:
        print(f"added: {', '.join(added)}")
    if removed:
        print(f"REMOVED: {', '.join(removed)}")
    if regressions:
        print(f"REGRESSIONS (> {bar}x):")
        for ratio, name, a, b, note in sorted(regressions, reverse=True):
            print(f"  {name:32s} {a:7.2f}s -> {b:7.2f}s  "
                  f"{'' if note else f'{ratio:.2f}x'}{note}")
    else:
        print(f"no regressions > {bar}x")
    improved = sorted(r for r in rows if r[0] < 1 / bar)
    if improved:
        print("improvements:")
        for ratio, name, a, b, _ in improved:
            print(f"  {name:32s} {a:7.2f}s -> {b:7.2f}s  {ratio:.2f}x")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
