#!/usr/bin/env python3
"""Fit per-query scaling exponents from multi-SF bench artifacts.

Model: t(sf) = a * sf^b, fitted by least squares on log-log points.
Only points >= min_t seconds enter the fit — below that, JVM fixed
overhead (job scheduling, codegen, file listing) dominates and the
fitted exponent measures the constant term, not the algorithm. With
fewer than 2 usable points the query is reported as "flat" (its time
never rose above the overhead floor at any measured scale: effectively
O(1) at these sizes).

Usage: scaling_fit.py sf1=bench_sf1.json sf0.1=bench_last.json ...
Prints a markdown table sorted by exponent (descending) plus a family
summary, for SCALE.md.
"""
import json, math, sys

MIN_T = 0.35  # seconds; below this the ~15-25ms/job JVM floor + codegen noise dominates


def load(arg):
    sf_s, path = arg.split("=", 1)
    d = json.load(open(path))
    qs = d["queries"] if "queries" in d else d
    return float(sf_s.replace("sf", "")), {k: v for k, v in qs.items() if v > 0}


def main(args):
    pts = sorted(load(a) for a in args)  # [(sf, {q: t})]
    names = sorted(set().union(*[set(q) for _, q in pts]))
    rows = []
    for n in names:
        series = [(sf, q[n]) for sf, q in pts if n in q]
        usable = [(sf, t) for sf, t in series if t >= MIN_T]
        if len(usable) < 2:
            rows.append((n, None, series))
            continue
        xs = [math.log(sf) for sf, _ in usable]
        ys = [math.log(t) for _, t in usable]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        denom = sum((x - mx) ** 2 for x in xs)
        b = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom
        rows.append((n, b, series))
    rows.sort(key=lambda r: (-(r[1] if r[1] is not None else -99), r[0]))
    sfs = [sf for sf, _ in pts]
    hdr = " | ".join(f"sf{sf:g}" for sf in sfs)
    print(f"| query | exponent | {hdr} |")
    print("|" + "---|" * (len(sfs) + 2))
    for n, b, series in rows:
        tmap = dict(series)
        cells = " | ".join(
            f"{tmap[sf]:.2f}" if sf in tmap else "-" for sf in sfs)
        bs = f"{b:.2f}" if b is not None else "flat"
        flag = " ⚠" if b is not None and b > 1.3 else ""
        print(f"| {n} | {bs}{flag} | {cells} |")
    fitted = [b for _, b, _ in rows if b is not None]
    if fitted:
        print(f"\nfitted: {len(fitted)}/{len(rows)} queries; "
              f"median exponent {sorted(fitted)[len(fitted)//2]:.2f}; "
              f">1.3: {sum(1 for b in fitted if b > 1.3)}")


if __name__ == "__main__":
    main(sys.argv[1:])
