#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each
outDir/<name>/ parquet produced by graft.Verify, run the matching oracle
SQL from outDir/oracle_sql.json in DuckDB over the sfDir tables, and
compare row count, schema (column names sorted), and values exactly.

Usage: compare.py <sfDir> <outDir>
"""
import json, math, os, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def frame_sig(df):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return cols, rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata: single file; tools/ScaleUp output: a
        # directory of part files under the same <table>.parquet name
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            t0 = time.time()
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchdf()
            want = con.execute(sql).fetchdf()
            dt = time.time() - t0
            gc, gr = frame_sig(got)
            wc, wr = frame_sig(want)
            if gc != wc:
                print(f"FAIL {name}: schema {gc} vs {wc}")
                bad += 1
            elif len(gr) != len(wr):
                print(f"FAIL {name}: rows {len(gr)} vs {len(wr)}")
                bad += 1
            elif gr != wr:
                i = next(i for i, (a, b) in enumerate(zip(gr, wr))
                         if a != b)
                print(f"FAIL {name}: first diff at row {i}:")
                print(f"  spark: {gr[i]}")
                print(f"  duck : {wr[i]}")
                bad += 1
            else:
                print(f"OK   {name} ({len(gr)} rows, {dt:.1f}s)")
                ok += 1
        except Exception as e:
            print(f"ERR  {name}: {str(e).splitlines()[0][:200]}")
            bad += 1
    print(f"== {ok} ok, {bad} bad ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
