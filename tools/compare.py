#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each
outDir/<name>/ parquet produced by graft.Verify, run the matching oracle
SQL from outDir/oracle_sql.json in DuckDB over the sfDir tables, and
compare row count, schema (column names sorted), and values exactly.

Usage: compare.py <sfDir> <outDir>            # full gate
       compare.py --one <sfDir> <outDir> <q>  # one query, own process

Allocator discipline (learned on the sf3 gate): a big oracle can
exhaust DuckDB's allocator, and the poisoned state survives both the
connection AND a reconnect in the same process (fresh connections then
fail 2 KiB allocations with 120 GiB of host memory free). So the fast
path stays in-process, and any query that errors is retried once in a
FRESH SUBPROCESS (--one) with a spill directory — one live instance at
a time, full memory available, crash-isolated from the rest of the
gate.
"""
import json, math, os, subprocess, sys, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Above this row count the per-cell Python repr compare dominates the
# gate's wall time (tens of millions of interpreter ops at sf1), so
# big results are compared INSIDE DuckDB: order-sensitive via
# POSITIONAL JOIN (DuckDB preserves scan/insertion order by default),
# value equality via SQL `IS NOT DISTINCT FROM` per column (NULL-safe;
# DuckDB's NaN = NaN matches norm_cell's NaN handling). The exact
# repr-level compare still covers every result below the bar — which
# at the driver's sf0.01 is ALL of them.
FAST_ROWS = int(os.environ.get("GRAFT_COMPARE_FAST_ROWS", "100000"))

# Known-heavy oracles that need a reduced thread count at scale: q09's
# nested non-spillable list() aggregation OOMs a 32-thread DuckDB child
# at sf>=3 (each thread owns its own aggregation buffers), but fits
# comfortably single-threaded — a PROPERTY of the oracle, not a
# discovery, so the gate runs it threads=1 up front instead of paying
# an ERR-then-retry cycle (115 s wasted at sf3, 229 s at sf10) every
# round. q50's oracle (list-agg signatures over 15M (suppkey, orderkey)
# groups) is the same family one notch lighter: at sf10 a 32-thread
# child thrashed past a 1800 s timeout while threads=8 finished in
# 124.5 s (round-9 gate). GRAFT_COMPARE_THREADS, when set, still wins
# globally.
HEAVY_ORACLE_THREADS = {"q09_behavioral_clustering": "1",
                        "q50_consensus_verdicts": "8"}
HEAVY_ORACLE_MIN_SF = 3.0


def parse_sf(sf_dir):
    """Scale factor from a .../sfN[.M] path; 0 if unrecognizable."""
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.0


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
    """Fresh in-memory DuckDB with the table views + a spill dir (an
    in-memory connection has no temp directory by default, so one
    oversized sort/join would exhaust the allocator with no
    out-of-core fallback)."""
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_compare_spill'")
    # fewer threads = fewer concurrent per-thread aggregation buffers;
    # the escape hatch for giant non-spillable oracles (list() aggs)
    t = os.environ.get("GRAFT_COMPARE_THREADS")
    if t:
        con.execute(f"SET threads={int(t)}")
    try:
        con.execute("SET max_temp_directory_size='60GiB'")
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


def compare_one(con, out_dir, name, sql):
    """Returns True iff the query matches; prints its OK/FAIL line."""
    try:
        return _compare_one(con, out_dir, name, sql)
    finally:
        # release the materialized oracle BEFORE the next query runs:
        # a multi-GB __want left resident is exactly the headroom the
        # next oracle needs (q08's 4.4M-row table cost q09 its run)
        try:
            con.execute("DROP TABLE IF EXISTS __want")
        except Exception:
            pass


def _compare_one(con, out_dir, name, sql):
    t0 = time.time()
    con.execute(
        "CREATE OR REPLACE TEMP VIEW __got AS SELECT * FROM "
        f"read_parquet('{out_dir}/{name}/*.parquet')")
    # materialize the oracle ONCE: count, schema and value passes
    # below would otherwise re-run the (expensive) SQL
    con.execute(f"CREATE OR REPLACE TEMP TABLE __want AS {sql}")
    ng = con.execute("SELECT count(*) FROM __got").fetchone()[0]
    nw = con.execute("SELECT count(*) FROM __want").fetchone()[0]
    gc = sorted(r[0] for r in con.execute("DESCRIBE __got").fetchall())
    wc = sorted(r[0] for r in con.execute("DESCRIBE __want").fetchall())
    if gc != wc:
        print(f"FAIL {name}: schema {gc} vs {wc}")
        return False
    if ng != nw:
        print(f"FAIL {name}: rows {ng} vs {nw}")
        return False
    if ng > FAST_ROWS:
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
            print(f"FAIL {name}: {n_diff} differing rows (in-db compare)")
            return False
        print(f"OK   {name} ({ng} rows, {dt:.1f}s, in-db)")
        return True
    got = con.execute("SELECT * FROM __got").fetchdf()
    want = con.execute("SELECT * FROM __want").fetchdf()
    dt = time.time() - t0
    _, gr = frame_sig(got)
    _, wr = frame_sig(want)
    if gr != wr:
        i = next(i for i, (a, b) in enumerate(zip(gr, wr)) if a != b)
        print(f"FAIL {name}: first diff at row {i}:")
        print(f"  spark: {gr[i]}")
        print(f"  duck : {wr[i]}")
        return False
    if not gr:
        # A 0-row match is still a match, but it proves nothing about
        # the query's value logic (both engines agreeing on "empty"
        # can mean a threshold/filter made the test vacuous at this
        # scale). Self-report it so gate artifacts carry their own
        # evidence strength — readers must not over-count these rows.
        print(f"OK   {name} (0 rows, {dt:.1f}s, VACUOUS — "
              "empty on both engines)")
        return True
    print(f"OK   {name} ({len(gr)} rows, {dt:.1f}s)")
    return True


def run_one(sf_dir, out_dir, name):
    """--one mode: exit 0 = match, 2 = mismatch, 1 = error."""
    # Warm the numpy/pandas import BEFORE the oracle runs: fetchdf()
    # imports them lazily, and a giant oracle (q09's non-spillable
    # nested list() aggs) can leave the allocator so starved that
    # numpy's C-extension import fails mid-fetch — surfacing as the
    # misleading "you should not try to import numpy from its source
    # directory" ImportError (observed at sf3, round 8). Importing up
    # front costs ~200 ms while memory is plentiful.
    import numpy, pandas  # noqa: F401
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    try:
        ok = compare_one(connect(sf_dir), out_dir, name, oracle[name])
        return 0 if ok else 2
    except Exception as e:
        print(f"ERR  {name}: {str(e).splitlines()[0][:200]}")
        return 1


def main(sf_dir, out_dir):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # GRAFT_COMPARE_ONLY=qA,qB restricts the run — lets a killed gate
    # resume on just the queries that have no OK line yet.
    only = os.environ.get("GRAFT_COMPARE_ONLY")
    if only:
        keep = set(only.split(","))
        oracle = {n: s for n, s in oracle.items() if n in keep}
    ok = bad = 0
    # Unattended-gate knobs (sf3 lesson: one ~quadratic oracle can hold
    # the whole gate hostage for an hour). GRAFT_COMPARE_SUBPROC=1
    # starts in subprocess-per-query mode — each child owns a fresh
    # allocator AND can be killed on GRAFT_COMPARE_TIMEOUT_S without
    # losing the rest of the gate; a timeout prints a loud ERR line and
    # counts as bad, never as silent skip.
    poisoned = os.environ.get("GRAFT_COMPARE_SUBPROC") == "1"
    timeout_s = float(os.environ.get("GRAFT_COMPARE_TIMEOUT_S", "0")) or None
    # Heavy-oracle routing (see HEAVY_ORACLE_THREADS): at sf>=3 those
    # queries go straight to a fresh reduced-thread child, never through
    # the shared in-process connection (whose thread count is fixed at
    # connect time) and never through a doomed 32-thread first attempt.
    heavy_sf = parse_sf(sf_dir) >= HEAVY_ORACLE_MIN_SF
    threads_global = os.environ.get("GRAFT_COMPARE_THREADS")
    con = None if poisoned else connect(sf_dir)
    for name, sql in sorted(oracle.items()):
        heavy = (heavy_sf and not threads_global
                 and name in HEAVY_ORACLE_THREADS)
        if not poisoned and not heavy:
            try:
                if compare_one(con, out_dir, name, sql):
                    ok += 1
                else:
                    bad += 1
                continue
            except Exception as e:
                # DuckDB allocator exhaustion poisons the whole
                # PROCESS: reconnects fail tiny allocations from here
                # on (measured repeatedly on the sf3 gate). Flip to
                # subprocess-per-query for everything remaining — each
                # child is the sole owner of a fresh allocator, with
                # the spill dir for oversized oracles.
                print(f"     (in-process run poisoned at {name}: "
                      f"{str(e).splitlines()[0][:110]}; "
                      "switching to subprocess-per-query)")
                sys.stdout.flush()
                poisoned = True
                try:
                    con.close()
                except Exception:
                    pass
        try:
            env = dict(os.environ)
            if heavy:
                env["GRAFT_COMPARE_THREADS"] = HEAVY_ORACLE_THREADS[name]
                print(f"     ({name}: known-heavy oracle at sf>=3 — "
                      f"fresh threads={env['GRAFT_COMPARE_THREADS']} child)")
                sys.stdout.flush()
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one",
                 sf_dir, out_dir, name], timeout=timeout_s, env=env)
            rc = r.returncode
        except subprocess.TimeoutExpired:
            print(f"ERR  {name}: oracle timeout after {timeout_s:.0f}s "
                  "(child killed)")
            rc = 1
        if rc == 0:
            ok += 1
        else:
            bad += 1  # child printed its own FAIL/ERR line
        sys.stdout.flush()
    print(f"== {ok} ok, {bad} bad ==")
    return 1 if bad else 0


if __name__ == "__main__":
    if sys.argv[1] == "--one":
        sys.exit(run_one(sys.argv[2], sys.argv[3], sys.argv[4]))
    sys.exit(main(sys.argv[1], sys.argv[2]))
