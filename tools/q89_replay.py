#!/usr/bin/env python3
"""q89_pagerank oracle replay for big scale factors (q65 precedent).

The declared one-statement oracle unrolls the 3-round integer PageRank
recurrence as a CTE chain; at sf3 that statement cost 84 s in-process
and at sf10 it exceeds the gate's per-query budget. The recurrence
itself is cheap when replayed ITERATIVELY with materialized temp
tables (each round = one join + one aggregation over the edge table),
exactly the same SQL per round as the CTE steps — bit-identical
because every operation is integer (floor-div contributions, integer
sums; no FP anywhere until the final /1e6 display division).

Usage: q89_replay.py <sfDir> <verifyDir>
  compares <verifyDir>/q89_pagerank/*.parquet against the replay.
Exit 0 = zero differing rows.
"""
import sys, time

import duckdb

# mirror of PipelineQueries' PrIters/PrDampNum/PrDampDen/PrTeleportU
ITERS = 3
DAMP_NUM = 85
DAMP_DEN = 100
TELEPORT_U = ((DAMP_DEN - DAMP_NUM) * 1000000) // DAMP_DEN


def main(sf_dir, verify_dir):
    t0 = time.time()
    con = duckdb.connect()
    con.execute("PRAGMA threads=16")
    con.execute("SET temp_directory='/tmp/duckdb_q89_spill'")
    con.execute("SET max_temp_directory_size='60GiB'")
    for t in ("orders", "lineitem"):
        p = f"{sf_dir}/{t}.parquet"
        import os
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    con.execute("""
      CREATE TEMP TABLE ed AS
      WITH raw AS (
        SELECT DISTINCT 'c' || o.o_custkey AS src,
          's' || l.l_suppkey AS dst
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      sym AS (
        SELECT src, dst FROM raw
        UNION SELECT dst AS src, src AS dst FROM raw),
      dg AS (SELECT src AS node, COUNT(*)::BIGINT AS deg
             FROM sym GROUP BY src)
      SELECT s.src, s.dst, d.deg FROM sym s JOIN dg d ON s.src = d.node
    """)
    ne = con.execute("SELECT count(*) FROM ed").fetchone()[0]
    print(f"edges: {ne} ({time.time() - t0:.0f}s)", flush=True)
    con.execute("""CREATE TEMP TABLE r AS
      SELECT DISTINCT src AS node, 1000000::BIGINT AS rank_u FROM ed""")
    for i in range(ITERS):
        con.execute(f"""
          CREATE TEMP TABLE r2 AS
          SELECT e.dst AS node,
            ({TELEPORT_U} + SUM(
              ({DAMP_NUM} * r.rank_u) // ({DAMP_DEN} * e.deg)
            ))::BIGINT AS rank_u
          FROM ed e JOIN r ON e.src = r.node
          GROUP BY e.dst""")
        con.execute("DROP TABLE r")
        con.execute("ALTER TABLE r2 RENAME TO r")
        print(f"round {i + 1} done ({time.time() - t0:.0f}s)", flush=True)
    n_diff = con.execute(f"""
      SELECT count(*) FROM (
        SELECT node, CAST(rank_u AS DOUBLE) / 1000000.0 AS rank FROM r
      ) w FULL JOIN read_parquet('{verify_dir}/q89_pagerank/*.parquet') g
        USING (node)
      WHERE g.rank IS DISTINCT FROM w.rank""").fetchone()[0]
    nr = con.execute(
        f"SELECT count(*) FROM read_parquet("
        f"'{verify_dir}/q89_pagerank/*.parquet')").fetchone()[0]
    nw = con.execute("SELECT count(*) FROM r").fetchone()[0]
    status = "OK" if (n_diff == 0 and nr == nw) else "FAIL"
    print(f"{status}   q89_pagerank replay: spark={nr} duck={nw} "
          f"diff={n_diff} ({time.time() - t0:.0f}s)")
    return 0 if status == "OK" else 2


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
