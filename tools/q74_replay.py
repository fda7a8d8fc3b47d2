#!/usr/bin/env python3
"""q74_semantic_dedup oracle replay for big scale factors.

The declared oracle's transitive closure is a one-shot WITH RECURSIVE
`reach` CTE — the allocator-killer class the sf10 gate documents for
q65 (the closure materializes every (node, reachable-root) pair before
the MIN collapses it). This replay runs the IDENTICAL non-recursive
prefix SQL (seeds → cells → candidate pairs → edges), then labels
components with the iterative min-label fixpoint + pointer-halving —
the same per-round SQL the q65 replay proved equivalent (zero diffs),
convergent in O(log diameter) rounds with only (node, label) state.

Usage: q74_replay.py <sfDir> <verifyDir> [embSampleMod]
  compares <verifyDir>/q74_semantic_dedup/*.parquet. embSampleMod must
  match the GRAFT_GATE_EMB_MOD the Spark dump ran with (default 1).
Exit 0 = zero differing rows.
"""
import os, sys, time

import duckdb


def main(sf_dir, verify_dir, emb_mod=1):
    t0 = time.time()
    con = duckdb.connect()
    con.execute("PRAGMA threads=16")
    con.execute("SET temp_directory='/tmp/duckdb_q74_spill'")
    con.execute("SET max_temp_directory_size='60GiB'")
    p = f"{sf_dir}/embeddings.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{src}')")
    # identical prefix SQL to the declared oracle (TextDedupQueries):
    # ivf seed selection, cell assignment, within-cell candidate pairs
    con.execute(f"""
      CREATE TEMP TABLE cells AS
      WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
        WHERE vec_id % {emb_mod} = 0),
      seeds AS (
        SELECT vec_id AS cent_id, e AS cv FROM v
        ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
          ::BIGINT
        LIMIT 8),
      score AS (
        SELECT v.vec_id, s.cent_id,
          round(list_cosine_similarity(v.e, s.cv), 6) AS csim
        FROM v, seeds s)
      SELECT vec_id, cent_id AS cell, csim AS cent_sim FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
          ORDER BY csim DESC, cent_id) AS rn FROM score)
      WHERE rn = 1""")
    con.execute(f"""
      CREATE TEMP TABLE edges AS
      WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
        WHERE vec_id % {emb_mod} = 0),
      cand AS (
        SELECT cx.vec_id AS a_id, cy.vec_id AS b_id
        FROM cells cx JOIN v x ON x.vec_id = cx.vec_id
          JOIN cells cy ON cx.cell = cy.cell
          JOIN v y ON y.vec_id = cy.vec_id
        WHERE cx.vec_id < cy.vec_id
          AND list_cosine_similarity(x.e, y.e) >= 0.3)
      SELECT a_id AS src, b_id AS dst FROM cand
      UNION SELECT b_id, a_id FROM cand""")
    ne = con.execute("SELECT count(*) FROM edges").fetchone()[0]
    print(f"edges: {ne} ({time.time() - t0:.0f}s)", flush=True)
    # iterative min-label fixpoint + pointer-halving (q65 replay SQL)
    con.execute(
        "CREATE TEMP TABLE lbl AS SELECT DISTINCT src AS id, src AS g "
        "FROM edges")
    for r in range(64):
        con.execute("""
          CREATE TEMP TABLE lbl2 AS
          SELECT id, least(min(g1), min(gh)) AS g FROM (
            SELECT l.id, least(l.g, nb.g) AS g1, lh.g AS gh
            FROM lbl l
            JOIN edges e ON e.src = l.id
            JOIN lbl nb ON nb.id = e.dst
            JOIN lbl lh ON lh.id = l.g) GROUP BY id""")
        changed = con.execute(
            "SELECT count(*) FROM lbl a JOIN lbl2 b USING (id) "
            "WHERE a.g <> b.g").fetchone()[0]
        con.execute("DROP TABLE lbl")
        con.execute("ALTER TABLE lbl2 RENAME TO lbl")
        print(f"round {r}: changed {changed} ({time.time() - t0:.0f}s)",
              flush=True)
        if changed == 0:
            break
    n_diff = con.execute(f"""
      SELECT count(*) FROM (
        WITH gr AS (
          SELECT c.vec_id, c.cell, c.cent_sim,
            COALESCE(l.g, c.vec_id) AS group_id
          FROM cells c LEFT JOIN lbl l ON c.vec_id = l.id)
        SELECT vec_id, cell, cent_sim, group_id,
          (row_number() OVER (PARTITION BY group_id
            ORDER BY cent_sim DESC, vec_id)) = 1 AS kept
        FROM gr) w
      FULL JOIN read_parquet(
        '{verify_dir}/q74_semantic_dedup/*.parquet') g
        USING (vec_id)
      WHERE g.cell IS DISTINCT FROM w.cell
         OR g.cent_sim IS DISTINCT FROM w.cent_sim
         OR g.group_id IS DISTINCT FROM w.group_id
         OR g.kept IS DISTINCT FROM w.kept""").fetchone()[0]
    nr = con.execute(
        f"SELECT count(*) FROM read_parquet("
        f"'{verify_dir}/q74_semantic_dedup/*.parquet')").fetchone()[0]
    nw = con.execute("SELECT count(*) FROM cells").fetchone()[0]
    status = "OK" if (n_diff == 0 and nr == nw) else "FAIL"
    print(f"{status}   q74_semantic_dedup replay: spark={nr} duck={nw} "
          f"diff={n_diff} ({time.time() - t0:.0f}s)")
    return 0 if status == "OK" else 2


if __name__ == "__main__":
    mod = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    sys.exit(main(sys.argv[1], sys.argv[2], mod))
