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


def connect(sf_dir):
    """Fresh in-memory DuckDB with the table views + a SPILL directory.

    The temp_directory matters at scale: an in-memory connection has no
    spill location by default, so one oversized sort/join exhausts the
    allocator and — worse — the connection never recovers: every later
    query on it fails with "bad allocation" (observed on the sf3 gate:
    q08's 4.4M-row in-db compare poisoned the connection and 53
    downstream queries ERR'd). With a temp dir, big operators go
    out-of-core instead."""
    con = duckdb.connect()
    # cap the instance well below the default 80%-of-RAM: the limit is
    # PER DATABASE INSTANCE, so a ballooned run plus its reconnect
    # replacement would otherwise race for the same physical memory
    # during teardown (observed: fresh connections failing 2 KiB
    # allocations while the host had 120 GiB free). With a spill dir,
    # big sorts/aggregations go out-of-core instead of ballooning.
    con.execute("SET memory_limit='24GiB'")
    con.execute("SET temp_directory='/tmp/duckdb_compare_spill'")
    try:
        con.execute("SET max_temp_directory_size='40GiB'")
    except Exception:
        pass  # older DuckDB: unlimited temp dir is the default
    for t in TABLES:
        # driver testdata: single file; tools/ScaleUp output: a
        # directory of part files under the same <table>.parquet name
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return con


def main(sf_dir, out_dir):
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    # Above this row count the per-cell Python repr compare dominates the
    # gate's wall time (tens of millions of interpreter ops at sf1), so
    # big results are compared INSIDE DuckDB: order-sensitive via
    # POSITIONAL JOIN (DuckDB preserves scan/insertion order by default),
    # value equality via SQL `IS NOT DISTINCT FROM` per column (NULL-safe;
    # DuckDB's NaN = NaN matches norm_cell's NaN handling). The exact
    # repr-level compare still covers every result below the bar — which
    # at the driver's sf0.01 is ALL of them.
    FAST_ROWS = int(os.environ.get("GRAFT_COMPARE_FAST_ROWS", "100000"))

    def compare_one(name, sql):
        nonlocal ok, bad
        t0 = time.time()
        con.execute(
            "CREATE OR REPLACE TEMP VIEW __got AS SELECT * FROM "
            f"read_parquet('{out_dir}/{name}/*.parquet')")
        # materialize the oracle ONCE: count, schema and value
        # passes below would otherwise re-run the (expensive) SQL
        con.execute(f"CREATE OR REPLACE TEMP TABLE __want AS {sql}")
        ng = con.execute("SELECT count(*) FROM __got").fetchone()[0]
        nw = con.execute("SELECT count(*) FROM __want").fetchone()[0]
        gc = sorted(r[0] for r in
                    con.execute("DESCRIBE __got").fetchall())
        wc = sorted(r[0] for r in
                    con.execute("DESCRIBE __want").fetchall())
        if gc != wc:
            print(f"FAIL {name}: schema {gc} vs {wc}")
            bad += 1
        elif ng != nw:
            print(f"FAIL {name}: rows {ng} vs {nw}")
            bad += 1
        elif ng > FAST_ROWS:
            qg = ", ".join(f'"{c}" AS g{i}' for i, c in enumerate(gc))
            qw = ", ".join(f'"{c}" AS w{i}' for i, c in enumerate(wc))
            cond = " AND ".join(f"g{i} IS NOT DISTINCT FROM w{i}"
                                for i in range(len(gc)))
            n_diff = con.execute(
                f"SELECT count(*) FROM (SELECT {qg} FROM __got) g "
                f"POSITIONAL JOIN (SELECT {qw} FROM __want) w "
                f"WHERE NOT ({cond})").fetchone()[0]
            dt = time.time() - t0
            if n_diff:
                print(f"FAIL {name}: {n_diff} differing rows "
                      "(in-db compare)")
                bad += 1
            else:
                print(f"OK   {name} ({ng} rows, {dt:.1f}s, in-db)")
                ok += 1
        else:
            got = con.execute("SELECT * FROM __got").fetchdf()
            want = con.execute("SELECT * FROM __want").fetchdf()
            dt = time.time() - t0
            _, gr = frame_sig(got)
            _, wr = frame_sig(want)
            if gr != wr:
                i = next(i for i, (a, b) in enumerate(zip(gr, wr))
                         if a != b)
                print(f"FAIL {name}: first diff at row {i}:")
                print(f"  spark: {gr[i]}")
                print(f"  duck : {wr[i]}")
                bad += 1
            else:
                print(f"OK   {name} ({len(gr)} rows, {dt:.1f}s)")
                ok += 1

    for name, sql in sorted(oracle.items()):
        try:
            compare_one(name, sql)
        except Exception as e:
            msg = str(e).splitlines()[0]
            # a blown allocator poisons the connection for every later
            # query: reconnect and retry before recording an ERR. The
            # reconnect itself can fail under transient host memory
            # pressure — back off and keep the gate alive either way.
            try:
                con.close()
            except Exception:
                pass
            try:
                time.sleep(5)
                con = connect(sf_dir)
                compare_one(name, sql)
                print(f"     ({name}: reconnected after: {msg[:120]})")
            except Exception as e2:
                print(f"ERR  {name}: {str(e2).splitlines()[0][:200]}")
                bad += 1
                try:
                    con = connect(sf_dir)
                except Exception:
                    pass
    print(f"== {ok} ok, {bad} bad ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
