#!/usr/bin/env python3
"""q09_behavioral_clustering oracle replay for big scale factors.

The declared oracle's two nested list() aggregations run over ALL of
lineitem in one statement; list() state is not spillable, so at sf10
(60M rows, ~54M (suppkey, orderkey) groups) the statement exhausts the
allocator even single-threaded — the same class as q65/q74's one-shot
closures. The clustering is supplier-independent until the final
fingerprint GROUP BY (one row per supplier), so this replay runs the
IDENTICAL s1/s2 SQL per supplier chunk (`l_suppkey % N = i` keeps
every group intact), accumulates the per-supplier fingerprints (small:
one row per supplier), then runs the final cluster grouping over that
table — same semantics, chunk-bounded list-agg memory.

Usage: q09_replay.py <sfDir> <verifyDir> [chunks=16]
  compares <verifyDir>/q09_behavioral_clustering/*.parquet.
Exit 0 = zero differing rows.
"""
import os, sys, time

import duckdb


def main(sf_dir, verify_dir, chunks=16):
    t0 = time.time()
    con = duckdb.connect()
    con.execute("PRAGMA threads=16")
    con.execute("SET temp_directory='/tmp/duckdb_q09_spill'")
    con.execute("SET max_temp_directory_size='60GiB'")
    p = f"{sf_dir}/lineitem.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{src}')")
    con.execute(
        "CREATE TEMP TABLE s2 (l_suppkey BIGINT, fp VARCHAR)")
    for i in range(chunks):
        # identical s1/s2 SQL to the declared oracle, restricted to one
        # supplier residue class — (suppkey, orderkey) groups and the
        # per-supplier fingerprint never cross chunks
        con.execute(f"""
          INSERT INTO s2
          WITH s1 AS (
            SELECT l_suppkey, l_orderkey,
              CAST(to_json(list(l_returnflag
                ORDER BY l_linenumber, l_returnflag)) AS VARCHAR) AS sig
            FROM lineitem WHERE l_suppkey % {chunks} = {i}
            GROUP BY l_suppkey, l_orderkey)
          SELECT l_suppkey,
            to_json(list(md5(sig) ORDER BY l_orderkey)) AS fp
          FROM s1 GROUP BY l_suppkey""")
        n = con.execute("SELECT count(*) FROM s2").fetchone()[0]
        print(f"chunk {i + 1}/{chunks}: {n} suppliers fingerprinted "
              f"({time.time() - t0:.0f}s)", flush=True)
    n_diff = con.execute(f"""
      SELECT count(*) FROM (
        SELECT md5(fp) AS fp_hash, COUNT(*) AS cluster_size,
          to_json(list(l_suppkey ORDER BY l_suppkey)) AS impls
        FROM s2 GROUP BY fp) w
      FULL JOIN read_parquet(
        '{verify_dir}/q09_behavioral_clustering/*.parquet') g
        USING (fp_hash)
      WHERE g.cluster_size IS DISTINCT FROM w.cluster_size
         OR g.impls IS DISTINCT FROM w.impls""").fetchone()[0]
    nr = con.execute(
        f"SELECT count(*) FROM read_parquet("
        f"'{verify_dir}/q09_behavioral_clustering/*.parquet')"
    ).fetchone()[0]
    nw = con.execute(
        "SELECT count(*) FROM (SELECT fp FROM s2 GROUP BY fp)"
    ).fetchone()[0]
    status = "OK" if (n_diff == 0 and nr == nw) else "FAIL"
    print(f"{status}   q09_behavioral_clustering replay: spark={nr} "
          f"duck={nw} diff={n_diff} ({time.time() - t0:.0f}s)")
    return 0 if status == "OK" else 2


if __name__ == "__main__":
    ch = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    sys.exit(main(sys.argv[1], sys.argv[2], ch))
